package graft

import graft.core.groups._
import org.scalatest.funsuite.AnyFunSuite

class AssignorsSpec extends AnyFunSuite {

  private def flatten(a: Map[String, Map[String, Seq[Int]]]): Seq[(String, String, Int)] =
    a.toSeq.flatMap { case (m, ts) => ts.toSeq.flatMap { case (t, ps) => ps.map((m, t, _)) } }

  // --- RangeAssignor: mirrors reference RangeAssignorTest semantics ---

  test("range: even split") {
    val a = RangeAssignor.assign(Seq("m1", "m2"), Map("t" -> 4))
    assert(a("m1")("t") === Seq(0, 1))
    assert(a("m2")("t") === Seq(2, 3))
  }

  test("range: uneven split gives first members the extra partition") {
    val a = RangeAssignor.assign(Seq("m2", "m1", "m3"), Map("t" -> 7))
    assert(a("m1")("t") === Seq(0, 1, 2)) // sorted members; 7 = 3+2+2
    assert(a("m2")("t") === Seq(3, 4))
    assert(a("m3")("t") === Seq(5, 6))
  }

  test("range: more members than partitions leaves tail members empty") {
    val a = RangeAssignor.assign(Seq("m1", "m2", "m3"), Map("t" -> 2))
    assert(a("m1")("t") === Seq(0))
    assert(a("m2")("t") === Seq(1))
    assert(!a.contains("m3"))
  }

  // --- RoundRobinAssignor ---

  test("roundrobin: deals the flattened universe cyclically") {
    val a = RoundRobinAssignor.assign(Seq("m1", "m2"), Map("a" -> 3, "b" -> 2))
    // universe sorted: (a,0)(a,1)(a,2)(b,0)(b,1)
    assert(a("m1")("a") === Seq(0, 2))
    assert(a("m1")("b") === Seq(1))
    assert(a("m2")("a") === Seq(1))
    assert(a("m2")("b") === Seq(0))
  }

  // --- StickyAssignor: mirrors reference StickyAssignorTest semantics ---

  test("sticky: fresh assignment is balanced") {
    val a = StickyAssignor.assign(Seq("m1", "m2"), Map("t" -> 4))
    val sizes = a.view.mapValues(_.values.map(_.size).sum).toMap
    assert(sizes.values.sum === 4)
    assert(sizes.values.max - sizes.values.min <= 1)
  }

  test("sticky: preserves previous ownership after member leaves") {
    val prev = Map(
      "m1" -> Map("t" -> Seq(0, 1)),
      "m2" -> Map("t" -> Seq(2, 3)))
    val a = StickyAssignor.assign(Seq("m1", "m3"), Map("t" -> 4), prev)
    assert(a("m1")("t") === Seq(0, 1)) // m1 keeps its claim
    assert(a("m3")("t") === Seq(2, 3)) // orphaned partitions go to m3
  }

  test("sticky: cap prevents hoarding when members join") {
    val prev = Map("m1" -> Map("t" -> Seq(0, 1, 2, 3)))
    val a = StickyAssignor.assign(Seq("m1", "m2"), Map("t" -> 4), prev)
    assert(a("m1")("t").size === 2) // ceil(4/2) cap
    assert(a("m2")("t").size === 2)
  }

  test("sticky: drops partitions that left the topic range") {
    val prev = Map("m1" -> Map("t" -> Seq(0, 5)))
    val a = StickyAssignor.assign(Seq("m1"), Map("t" -> 2), prev)
    assert(flatten(a).map(_._3).sorted === Seq(0, 1))
  }

  // --- properties shared by all assignors (exhaustive over a deterministic
  //     grid of member counts × topic shapes) ---

  val grid: Seq[(List[String], Map[String, Int])] = for {
    m <- 1 to 8
    topics <- Seq(Map("t1" -> 1), Map("t1" -> 7), Map("t1" -> 16),
      Map("t1" -> 3, "t2" -> 5), Map("t1" -> 8, "t2" -> 1, "t3" -> 4))
  } yield ((1 to m).map(i => s"m$i").toList, topics)

  for ((name, assignor) <- Assignors.all) {
    test(s"$name: every partition assigned exactly once; deterministic") {
      val rnd = new scala.util.Random(42)
      grid.foreach { case (members, topics) =>
        val a = assignor.assign(members, topics)
        val got = flatten(a).map { case (_, t, p) => (t, p) }.sorted
        val want = topics.toSeq.flatMap { case (t, n) => (0 until n).map((t, _)) }.sorted
        assert(got === want, s"members=$members topics=$topics")
        // order-insensitive in the member list, stable across calls
        assert(assignor.assign(rnd.shuffle(members), topics) === a)
      }
    }
  }

  test("roundrobin + sticky balance: member loads differ by at most 1") {
    grid.foreach { case (members, topics) =>
      for (assignor <- Seq(RoundRobinAssignor, StickyAssignor)) {
        val a = assignor.assign(members, topics)
        val loads = members.map(m =>
          a.getOrElse(m, Map.empty).values.map(_.size).sum)
        assert(loads.max - loads.min <= 1,
          s"${assignor.name} members=$members topics=$topics loads=$loads")
      }
    }
  }

  // --- negotiation (reference GroupCoordinatorServiceImpl.java:47-148) ---

  test("negotiation: first joiner leads, leader preference wins") {
    import Negotiation._
    val r = negotiate(Seq(
      Member("mB", Seq("sticky", "range")),
      Member("mA", Seq("range", "sticky"))))
    assert(r === Some(("mB", "sticky")))
    assert(negotiate(Seq(
      Member("m1", Seq("range")),
      Member("m2", Seq("roundrobin")))) === None)
    assert(negotiate(Nil) === None)
  }
}
