package graft

import graft.core.groups.{Assignors, RangeAssignor, RoundRobinAssignor, StickyAssignor}
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties the reference's test suite lacks (SURVEY.md §5):
  * assignment completeness, exclusivity, balance, and determinism over
  * arbitrary member sets and partition counts. */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  private val genMembers: Gen[Seq[String]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.const((1 to n).map(i => s"member-$i")))

  private val genTopics: Gen[Map[String, Int]] =
    for {
      nt <- Gen.chooseNum(1, 4)
      counts <- Gen.listOfN(nt, Gen.chooseNum(1, 40))
    } yield counts.zipWithIndex.map { case (c, i) => s"topic-$i" -> c }.toMap

  private def flatten(a: Map[String, Map[String, Seq[Int]]]): Seq[(String, Int)] =
    a.toSeq.flatMap { case (_, ts) => ts.toSeq.flatMap { case (t, ps) => ps.map(t -> _) } }

  for ((name, assignor) <- Assignors.all) {
    test(s"$name: every partition assigned exactly once, to a real member") {
      check(Prop.forAll(genMembers, genTopics) { (members, topics) =>
        val out = assignor.assign(members, topics)
        val assigned = flatten(out)
        val universe = topics.toSeq.flatMap { case (t, n) => (0 until n).map(t -> _) }
        assigned.sorted == universe.sorted &&
          out.keySet.subsetOf(members.toSet)
      })
    }

    test(s"$name: deterministic in member order") {
      check(Prop.forAll(genMembers, genTopics) { (members, topics) =>
        assignor.assign(members.reverse, topics) == assignor.assign(members, topics)
      })
    }
  }

  test("roundrobin + sticky(cold): member loads differ by at most one") {
    check(Prop.forAll(genMembers, genTopics) { (members, topics) =>
      Seq(RoundRobinAssignor, StickyAssignor).forall { assignor =>
        val out = assignor.assign(members, topics)
        val loads = members.map(m =>
          out.getOrElse(m, Map.empty).values.map(_.size).sum)
        loads.max - loads.min <= 1
      }
    })
  }

  test("range: each member's partitions are contiguous per topic") {
    check(Prop.forAll(genMembers, genTopics) { (members, topics) =>
      val out = RangeAssignor.assign(members, topics)
      out.values.forall(_.forall { case (_, ps) =>
        ps.sorted.zipWithIndex.forall { case (p, i) => p == ps.sorted.head + i }
      })
    })
  }

  test("sticky: previously-owned valid partitions are kept (up to cap)") {
    check(Prop.forAll(genMembers, genTopics) { (members, topics) =>
      val first = StickyAssignor.assign(members, topics)
      val again = StickyAssignor.assign(members, topics, previous = first)
      again == first // fixpoint: nothing to rebalance
    })
  }

  test("murmur2 partition is always in range") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.chooseNum(1, 1024)) { (s, n) =>
      val p = graft.functions.Murmur2.partition(s, n)
      p >= 0 && p < n
    })
  }
}
