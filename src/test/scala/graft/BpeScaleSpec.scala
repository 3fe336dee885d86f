package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Bpe

/** Vocab-scale BPE application ([[graft.functions.BpeFunctions]]): the
  * single-expression merge replay must (1) be byte-identical to the
  * unrolled replace chain (the SQL oracle's formulation) on arbitrary
  * trained tables, and (2) survive a 1,000+-merge vocabulary inside
  * whole-stage codegen with no fallback and an O(1)-in-merges plan —
  * the scale the per-merge replace chain structurally cannot reach. */
class BpeScaleSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side rank-order replay — the definitional semantics. */
  private def segRef(m: Bpe.BpeModel, w: String): Vector[String] =
    m.merges.foldLeft(w.map(_.toString).toVector) { (syms, pair) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
          out += (pair._1 + pair._2); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }

  private def randomWords(seed: Long, n: Int, minLen: Int, maxLen: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    // a narrow alphabet forces deep, heavily-reused merge chains
    val alpha = "abcdefgh"
    (0 until n).map { _ =>
      val len = minLen + rnd.nextInt(maxLen - minLen + 1)
      String.valueOf(Array.fill(len)(alpha(rnd.nextInt(alpha.length))))
    }.distinct
  }

  test("expression replay == unrolled replace chain on random trained tables") {
    (1 to 5).foreach { seed =>
      val words = randomWords(seed, 60, 3, 12)
      val freqs = words.zipWithIndex.map { case (w, i) => (w, (i % 7 + 1).toLong) }
      val m = Bpe.trainFromFreqs(freqs, numMerges = 40)
      val got = words.toDF("w")
        .select($"w", m.segment($"w").as("a"), m.segmentUnrolled($"w").as("b"))
        .as[(String, String, String)].collect()
      got.foreach { case (w, a, b) =>
        assert(a === b, s"seed=$seed word=$w: expression vs replace chain")
      }
    }
  }

  test("1,000+ merges apply inside whole-stage codegen, no fallback, O(1) plan") {
    val words = randomWords(42L, 1500, 8, 16)
    val freqs = words.zipWithIndex.map { case (w, i) => (w, (i % 13 + 1).toLong) }
    val m = Bpe.trainFromFreqs(freqs, numMerges = 1200)
    assert(m.merges.length >= 1000,
      s"synthetic corpus must yield a production-scale table, got ${m.merges.length}")
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // a real file scan — a local relation would be collapsed by
      // ConvertToLocalRelation and never reach whole-stage codegen
      val src = s"${tmpDir("graft-bpe-scale")}/words.parquet"
      words.toDF("w").write.parquet(src)
      val df = spark.read.parquet(src)
        .select($"w", m.pieces($"w").as("p"), m.wordTokenCount($"w").as("n"))
      val got = df.as[(String, Seq[String], Int)].collect()
      val expected = words.map(w => w -> segRef(m, w)).toMap
      got.foreach { case (w, p, n) =>
        assert(p === expected(w), s"word $w")
        assert(n === expected(w).length)
      }
      val plan = df.queryExecution.executedPlan
      import org.apache.spark.sql.execution.WholeStageCodegenExec
      assert(plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty,
        "the merge replay must stay inside a whole-stage codegen span")
      // O(1) plan: the table rides as ONE reference object, not 1,200
      // replace nodes (the unrolled chain's optimized plan would carry
      // ~40 chars × 1,200 merges × 3 call sites of literal text)
      val planChars = plan.toString.length
      assert(planChars < 20000,
        s"plan must not grow with the merge table, got $planChars chars")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("trainFromFreqs matches an independently-written reference trainer on random corpora") {
    // reference formulation kept deliberately different (functional pair
    // counting via groupMapReduce, recursive list rewrite) so a shared bug
    // cannot hide: count DESC / pair ASC argmax, overlaps counted,
    // left-to-right non-overlapping merge
    def refTrain(freqs: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
      def mergeAll(s: List[String], p: (String, String)): List[String] =
        s match {
          case a :: b :: rest if (a, b) == p => (a + b) :: mergeAll(rest, p)
          case a :: rest => a :: mergeAll(rest, p)
          case Nil => Nil
        }
      var segs = freqs.map { case (w, f) => (w.map(_.toString).toList, f) }
      val out = Seq.newBuilder[(String, String)]
      var k = 0
      var stop = false
      while (k < n && !stop) {
        val counts = segs
          .flatMap { case (s, f) => s.zip(s.drop(1)).map(p => p -> f) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        if (counts.isEmpty) stop = true
        else {
          val best = counts.toSeq
            .minBy { case ((l, r), c) => (-c, l, r) }._1
          out += best
          segs = segs.map { case (s, f) => (mergeAll(s, best), f) }
          k += 1
        }
      }
      out.result()
    }
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val words = (0 until 40).map { _ =>
        val len = 1 + rnd.nextInt(8)
        String.valueOf(Array.fill(len)("abcd".charAt(rnd.nextInt(4))))
      }.distinct
      val freqs = words.map(w => (w, (1 + rnd.nextInt(50)).toLong))
      val got = Bpe.trainFromFreqs(freqs, numMerges = 15).merges
      assert(got === refTrain(freqs, 15), s"seed=$seed freqs=$freqs")
    }
  }

  test("demo-parameter queries are unchanged by the expression path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Bpe.train(docs, $"text", numMerges = 16, maxWords = 128)
    val viaExpr = docs.select($"doc_id", m.tokenCount($"text").as("n"))
      .as[(Long, Int)].collect().toMap
    val viaChain = docs.select($"doc_id",
        aggregate(transform(Bpe.words($"text"), w => {
          val seg = m.segmentUnrolled(w)
          ((length(seg) - length(replace(seg, lit(Bpe.Sep), lit("")))) / 2)
            .cast("int")
        }), lit(0), (acc, x) => acc + x).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(viaExpr === viaChain)
  }
}
