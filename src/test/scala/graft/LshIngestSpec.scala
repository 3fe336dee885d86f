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

  test("batch-local planning is session-isolated: parent conf never touched") {
    import graft.pipeline.PlanUtil
    val path = tmpDir("graft-lsh-conf")
    LshIndex.build(df(1L -> base), $"doc_id", $"text", path,
      shingleSize = 5, numHashes = 128, bands = 16)
    val sp0 = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // sentinel values a toggle implementation would clobber mid-batch
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      // the chain plans on a memoized conf-isolated CLONE of the session
      val clone = PlanUtil.batchLocalSession(spark)
      assert(clone ne spark)
      assert(clone.conf.get("spark.sql.adaptive.enabled") == "false")
      assert(clone.conf.get("spark.sql.shuffle.partitions") == "8")
      assert(PlanUtil.batchLocalSession(spark) eq clone)
      // an ad-hoc parquet-backed aggregation, as a user would plan it on
      // the PARENT session while a stream ingests (round-15's shared-conf
      // toggle silently gave exactly this interleaving AQE-off 8-partition
      // plans)
      val adhocPath = s"${tmpDir("graft-lsh-conf-adhoc")}/t"
      df(90L -> "adhoc one", 91L -> "adhoc two").write.parquet(adhocPath)
      def adhocPlan(): String = spark.read.parquet(adhocPath)
        .groupBy($"text").count().queryExecution.executedPlan.toString
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      @volatile var sawToggle = false
      val ingest = Future {
        LshIndex.ingestBatch(spark, path,
          df(2L -> "some novel batch content entirely unlike the corpus"),
          $"doc_id", $"text").unpersist()
      }
      var checked = 0
      while (!ingest.isCompleted || checked == 0) {
        if (spark.conf.get("spark.sql.adaptive.enabled") != "true" ||
            spark.conf.get("spark.sql.shuffle.partitions") != "7")
          sawToggle = true
        val p = adhocPlan()
        assert(p.contains("AdaptiveSparkPlan"),
          s"concurrent parent-session query lost AQE:\n$p")
        checked += 1
      }
      Await.result(ingest, 2.minutes)
      assert(!sawToggle,
        "parent session conf flipped during an ingest batch")
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    } finally spark.conf.set("spark.sql.shuffle.partitions", sp0)
  }
}
