package graft

import org.apache.spark.sql.functions._
import graft.pipeline.LshIndex

/** [[LshIndex.ingestBatch]] — the steady-state streaming curation step:
  * each micro-batch drops near-dups of the standing corpus, dedups within
  * itself, appends its survivors to the index, and forwards them. The
  * index on disk IS the dedup state, so history is unbounded (no
  * watermark horizon), survives restarts, and is shared with the batch
  * pipeline. */
class LshIngestSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
      "from a warm windowsill in the late afternoon sunshine today"
  private def variant(s: String) = base.replace("today", s)

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("per-batch: corpus dups drop, within-batch dups dedup, survivors append") {
    val path = tmpDir("graft-lsh-ingest")
    LshIndex.build(df(1L -> base, 2L -> "completely unrelated content " * 8),
      $"doc_id", $"text", path, shingleSize = 5, numHashes = 128, bands = 16)
    // batch: 10 near-dups corpus doc 1; 11/12 near-dup each other (new);
    // 13 is novel
    val batch = df(
      10L -> variant("tonight"),
      11L -> ("fresh material nobody indexed yet " * 6 + "alpha beta"),
      12L -> ("fresh material nobody indexed yet " * 6 + "alpha gamma"),
      13L -> "entirely novel short document about something else altogether")
    val out = LshIndex.ingestBatch(spark, path, batch, $"doc_id", $"text")
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(11L, 13L),
      "10 near-dups the corpus, 12 loses the within-batch tie to 11")
    out.unpersist()
    // the survivors are now corpus: a later batch near-dupping 11 drops
    val next = LshIndex.ingestBatch(spark, path,
      df(20L -> ("fresh material nobody indexed yet " * 6 + "alpha delta")),
      $"doc_id", $"text")
    assert(next.count() === 0L)
    next.unpersist()
  }

  test("replay after append re-derives the identical survivor set") {
    val path = tmpDir("graft-lsh-replay")
    LshIndex.build(df(1L -> base), $"doc_id", $"text", path,
      shingleSize = 5, numHashes = 128, bands = 16)
    val batch = df(
      10L -> variant("tonight"), // dup of corpus
      11L -> ("some genuinely new text never seen before " * 5),
      12L -> ("some genuinely new text never seen before " * 5 + "tail"))
    val first = LshIndex.ingestBatch(spark, path, batch, $"doc_id", $"text")
      .select("doc_id").as[Long].collect().toSet
    // crash-after-append scenario: the same batch runs again with its own
    // signatures already indexed — self-pairs are ignored, so the verdict
    // per document is unchanged
    val replay = LshIndex.ingestBatch(spark, path, batch, $"doc_id", $"text")
      .select("doc_id").as[Long].collect().toSet
    assert(first === Set(11L))
    assert(replay === first)
  }

  test("foreachBatch wiring: multi-batch stream, index state survives batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir("graft-lsh-stream")
    LshIndex.build(df(1L -> base), $"doc_id", $"text", path,
      shingleSize = 5, numHashes = 128, bands = 16)
    val input = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = LshIndex.ingestBatch(spark, path, b, $"doc_id", $"text")
        seen.synchronized { seen ++= s.select("doc_id").as[Long].collect() }
        s.unpersist(); ()
      }
      .start()
    try {
      input.addData(Seq(
        10L -> variant("tonight"), // dup of the pre-built corpus
        11L -> ("first batch novel text " * 6)))
      q.processAllAvailable()
      input.addData(Seq(
        20L -> ("first batch novel text " * 6 + "extra"), // dup of 11 ACROSS batches
        21L -> ("second batch different novel text " * 6)))
      q.processAllAvailable()
      assert(seen.sorted === Seq(11L, 21L),
        "cross-batch near-dup must be caught by the on-disk index state")
    } finally q.stop()
  }

  test("survivor projection is a flat filter — no joins, no broadcasts (r15)") {
    // the verdict id sets re-enter the plan as codegen reference objects
    // (SetFunctions.inLongSet), so materializing the survivors must cost
    // ONE flat scan+filter: a Join or broadcast exchange here means the
    // per-consumer anti-join overhead regressed (it was ~2 s of driver
    // jobs per micro-batch at a streaming trigger)
    val path = tmpDir("graft-lsh-flat")
    LshIndex.build(df(1L -> base), $"doc_id", $"text", path,
      shingleSize = 5, numHashes = 128, bands = 16)
    // parquet-backed batch: a LocalRelation would be constant-folded by
    // ConvertToLocalRelation and hide the filter from the plan
    val batchPath = s"${tmpDir("graft-lsh-flat-in")}/batch"
    df(
      10L -> variant("tonight"), // corpus dup — forces a non-empty id set
      11L -> ("fresh material nobody indexed yet " * 6 + "alpha beta"),
      12L -> ("fresh material nobody indexed yet " * 6 + "alpha gamma"))
      .write.parquet(batchPath)
    val batch = spark.read.parquet(batchPath)
    val out = LshIndex.ingestBatch(spark, path, batch, $"doc_id", $"text")
    try {
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("in_long_set") || p.contains("LongSetContains"),
        s"survivor filter must use the id-set reference object:\n$p")
      assert(!p.contains("Join") && !p.contains("BroadcastExchange"),
        s"survivor materialization must not pay joins/broadcasts:\n$p")
    } finally out.unpersist()
  }

  test("batch-local planning scope restores session conf, even on failure") {
    val path = tmpDir("graft-lsh-conf")
    LshIndex.build(df(1L -> base), $"doc_id", $"text", path,
      shingleSize = 5, numHashes = 128, bands = 16)
    // sentinel values the scope must put back exactly
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    val out = LshIndex.ingestBatch(spark, path,
      df(2L -> "some novel batch content entirely unlike the corpus"),
      $"doc_id", $"text")
    out.unpersist()
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    // failure path: a body that throws must still restore
    intercept[RuntimeException] {
      graft.pipeline.PlanUtil.withBatchLocalPlanning(spark) {
        assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
        assert(spark.conf.get("spark.sql.shuffle.partitions") == "8")
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
  }
}
