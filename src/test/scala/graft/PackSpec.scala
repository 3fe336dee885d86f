package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pack

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("prefixSum matches the sequential scan across MANY range tasks") {
    // 20k rows over 8 range tasks: enough input partitions that a
    // layout-unstable two-pass implementation (independent shuffles cutting
    // different range boundaries) would misnumber — the pinning mirrors
    // PlanSpec's offset-assignment test.
    val n = 20000
    val df = spark.range(n).toDF("id")
      .withColumn("w", (pmod(col("id") * 2654435761L, lit(97)) + 1).cast("long"))
      .repartition(16) // scrambled input layout
    val out = Pack.prefixSum(df, col("id"), col("w"), "cum", parallelism = Some(8))
      .select("id", "w", "cum").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length === n)
    var run = 0L
    out.foreach { case (id, w, cum) =>
      run += w
      assert(cum === run, s"row $id: inclusive running total")
    }
  }

  test("prefixSum: null weights count zero; result carries original columns") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "w")
    val out = Pack.prefixSum(df, col("id"), col("w"), "cum")
      .orderBy("id").as[(Long, Option[Long], Long)].collect()
    assert(out.map(_._3).toSeq === Seq(5L, 5L, 12L))
  }

  test("packSequences: greedy fixed-budget packing invariants") {
    val docs = Seq(
      (0L, "a b c"),          // 3
      (1L, "d e f g h"),      // 5  → cum 8
      (2L, "i j"),            // 2  → cum 10, crosses 8: starts in seq 0
      (3L, "k l m n o p q r s t u v"), // 12 → longer than budget
      (4L, "w"),
      (5L, "x y z")
    ).toDF("doc_id", "text")
    val packed = Pack.packSequences(docs, col("doc_id"), col("text"), budget = 8)
      .orderBy("doc_id")
      .select("doc_id", "tokens", "cum_tokens", "seq_id")
      .as[(Long, Int, Long, Long)].collect().toSeq
    // doc joins the sequence in which it STARTS: seq = (cum - tokens) div 8
    assert(packed === Seq(
      (0L, 3, 3L, 0L),   // starts at 0
      (1L, 5, 8L, 0L),   // starts at 3
      (2L, 2, 10L, 1L),  // starts at 8 → seq 1
      (3L, 12, 22L, 1L), // starts at 10, longer than budget: owns its start seq
      (4L, 1, 23L, 2L),  // starts at 22
      (5L, 3, 26L, 2L)))
    // invariants: seq ids are monotone in doc order (contiguous membership),
    // and every doc starts inside its sequence's budget window
    packed.sliding(2).foreach { case Seq((_, _, _, s1), (_, _, _, s2)) =>
      assert(s2 >= s1, "sequence membership is contiguous in corpus order")
    }
    packed.foreach { case (id, tk, cum, seq) =>
      val start = cum - tk
      assert(start >= seq * 8 && start < (seq + 1) * 8, s"doc $id starts in seq $seq")
    }
  }

  test("packSequences plan: no window operator anywhere (no global-order funnel)") {
    val docs = (0 until 500).map(i => (i.toLong, ("tok " * (i % 37 + 1)).trim))
      .toDF("doc_id", "text")
    val packed = Pack.packSequences(docs, col("doc_id"), col("text"), budget = 64,
      parallelism = Some(4))
    val plan = packed.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global-order window would serialize at scale:\n$plan")
    // and the result is still the sequential truth
    val rows = packed.orderBy("doc_id")
      .select("tokens", "cum_tokens").as[(Int, Long)].collect()
    var run = 0L
    rows.foreach { case (tk, cum) => run += tk; assert(cum === run) }
  }
}
