package graft

import graft.core.groups.{Assignors, RangeAssignor, RoundRobinAssignor, StickyAssignor}
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties the reference's test suite lacks (SURVEY.md §5):
  * assignment completeness, exclusivity, balance, and determinism over
  * arbitrary member sets and partition counts. */
class PropertySpec extends AnyFunSuite {

  // ---- Ed-Join prefix-filter soundness (q_fuzzy_join's recall lemma) ----
  //
  // The fuzzy join indexes each name ONLY by its 7 rarest distinct
  // 3-grams under a global total order. Soundness claim: for strings of
  // length >= 9, any pair within Levenshtein distance 2 shares a gram
  // that lies in BOTH prefixes, for ANY global total order (one edit
  // changes <= 3 gram positions, so <= 3 distinct gram types can lose
  // their last occurrence; 2 edits miss <= 6 of the other's types, and
  // the standard prefix-filter argument pins an intersecting gram into
  // both 7-element prefixes). The property exercises random orders via
  // a seeded hash, so it checks the lemma itself, not one frequency
  // ranking.

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = d(0); d(0) = i
      for (j <- 1 to b.length) {
        val cur = d(j)
        d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(b.length)
  }

  private def prefix7(s: String, seed: Long): Set[String] =
    s.sliding(3).toSet.toSeq
      .sortBy((g: String) =>
        (scala.util.hashing.MurmurHash3.stringHash(g, seed.toInt), g))
      .take(7).toSet

  test("Ed-Join prefix filter: every d<=2 pair shares a gram in both 7-rarest prefixes") {
    val alpha = Gen.oneOf('a', 'b', 'c', 'd')
    val genBase = for {
      n <- Gen.choose(9, 24)
      cs <- Gen.listOfN(n, alpha)
    } yield cs.mkString
    val genEdit: Gen[(Int, Int, Char)] = for {
      op <- Gen.choose(0, 2)
      pos <- Gen.choose(0, 1000)
      c <- alpha
    } yield (op, pos, c)
    val genEdits = Gen.choose(0, 2).flatMap(k => Gen.listOfN(k, genEdit))
    def applyEdits(a: String, edits: List[(Int, Int, Char)]): String =
      edits.foldLeft(a) { case (s, (op, rawPos, c)) =>
        if (s.isEmpty) s
        else op match {
          case 0 => val p = rawPos % s.length; s.updated(p, c)
          case 1 => val p = rawPos % (s.length + 1); s.substring(0, p) + c + s.substring(p)
          case _ => val p = rawPos % s.length; s.substring(0, p) + s.substring(p + 1)
        }
      }
    check(Prop.forAll(genBase, genEdits, Gen.choose(Long.MinValue, Long.MaxValue)) {
      (a, edits, seed) =>
        val b = applyEdits(a, edits)
        if (a.length < 9 || b.length < 9 || lev(a, b) > 2) Prop.passed
        else Prop(prefix7(a, seed).intersect(prefix7(b, seed)).nonEmpty)
    })
  }

  test("Ed-Join LOCATION-BASED prefix: every d<=2 pair shares a gram type in both minimal prefixes") {
    // the round-15 prefix (TextFunctions.edjoinPrefixEval): shortest
    // rarity-ordered positional-gram prefix whose greedy interval
    // piercing exceeds d. The lemma must hold for ANY global total order
    // (frequencies are just one) — exercised via seeded random orders,
    // against the EXACT production helper.
    val alpha = Gen.oneOf('a', 'b', 'c', 'd')
    val genBase = for {
      n <- Gen.choose(9, 24)
      cs <- Gen.listOfN(n, alpha)
    } yield cs.mkString
    val genEdit: Gen[(Int, Int, Char)] = for {
      op <- Gen.choose(0, 2)
      pos <- Gen.choose(0, 1000)
      c <- alpha
    } yield (op, pos, c)
    val genEdits = Gen.choose(0, 2).flatMap(k => Gen.listOfN(k, genEdit))
    def applyEdits(a: String, edits: List[(Int, Int, Char)]): String =
      edits.foldLeft(a) { case (s, (op, rawPos, c)) =>
        if (s.isEmpty) s
        else op match {
          case 0 => val p = rawPos % s.length; s.updated(p, c)
          case 1 => val p = rawPos % (s.length + 1); s.substring(0, p) + c + s.substring(p)
          case _ => val p = rawPos % s.length; s.substring(0, p) + s.substring(p + 1)
        }
      }
    check(Prop.forAll(genBase, genEdits, Gen.choose(Long.MinValue, Long.MaxValue)) {
      (a, edits, seed) =>
        val b = applyEdits(a, edits)
        if (a.length < 9 || b.length < 9 || lev(a, b) > 2) Prop.passed
        else {
          // ONE shared frequency map covering both strings' grams (the
          // production shape: one corpus-wide table)
          val freq = new java.util.HashMap[String, Long]()
          (a.sliding(3) ++ b.sliding(3)).foreach(g => freq.put(g,
            (scala.util.hashing.MurmurHash3.stringHash(g, seed.toInt).toLong
              & 0xffffffffL)))
          def pf(s: String): Set[String] = {
            val arr = graft.functions.TextFunctions.edjoinPrefixEval(
              org.apache.spark.unsafe.types.UTF8String.fromString(s), freq, 3, 2)
            (0 until arr.numElements())
              .map(i => arr.getUTF8String(i).toString).toSet
          }
          Prop(pf(a).intersect(pf(b)).nonEmpty)
        }
    })
  }

  test("q-gram count filter: d<=2 pairs lose at most d*q=6 distinct 3-grams (and <=2 length)") {
    // soundness of qFuzzyJoin's pre-Levenshtein rejects: each edit
    // affects <= q = 3 gram windows, so at most d*q distinct grams of A
    // can lose their every occurrence; and each edit changes the length
    // by <= 1. Rejecting absent > 6 or |len delta| > 2 can therefore
    // never drop a true d <= 2 pair.
    val alpha = Gen.oneOf('a', 'b', 'c', 'd')
    val genBase = for {
      n <- Gen.choose(9, 24)
      cs <- Gen.listOfN(n, alpha)
    } yield cs.mkString
    val genEdit: Gen[(Int, Int, Char)] = for {
      op <- Gen.choose(0, 2)
      pos <- Gen.choose(0, 1000)
      c <- alpha
    } yield (op, pos, c)
    val genEdits = Gen.choose(0, 2).flatMap(k => Gen.listOfN(k, genEdit))
    def applyEdits(a: String, edits: List[(Int, Int, Char)]): String =
      edits.foldLeft(a) { case (s, (op, rawPos, c)) =>
        if (s.isEmpty) s
        else op match {
          case 0 => val p = rawPos % s.length; s.updated(p, c)
          case 1 => val p = rawPos % (s.length + 1); s.substring(0, p) + c + s.substring(p)
          case _ => val p = rawPos % s.length; s.substring(0, p) + s.substring(p + 1)
        }
      }
    check(Prop.forAll(genBase, genEdits) { (a, edits) =>
      val b = applyEdits(a, edits)
      val d = lev(a, b)
      if (a.length < 9 || b.length < 9 || d > 2) Prop.passed
      else {
        val absentAB = (a.sliding(3).toSet -- b.sliding(3).toSet).size
        val absentBA = (b.sliding(3).toSet -- a.sliding(3).toSet).size
        Prop(absentAB <= 3 * d && absentBA <= 3 * d &&
          math.abs(a.length - b.length) <= d)
      }
    })
  }

  test("sortedAbsentCount agrees with the set-difference size") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val genArr = Gen.listOf(Gen.oneOf("aa", "ab", "ba", "bb", "ca", "cb"))
    check(Prop.forAll(genArr, genArr) { (xs, ys) =>
      val sa = xs.distinct.sorted
      val sb = ys.distinct.sorted
      def ad(s: Seq[String]) =
        new GenericArrayData(s.map(UTF8String.fromString).toArray[Any])
      Prop(graft.functions.TextFunctions.sortedAbsentCount(ad(sa), ad(sb)) ==
        (sa.toSet -- sb.toSet).size)
    })
  }


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
