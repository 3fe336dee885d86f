package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.log.LogWriter

/** Pins the intent-file protocol of [[ConsumeState]] — the exactly-once
  * machinery under [[StreamIngest.consume]]:
  *
  *   - a batch's range is decided ONCE and persisted before delivery; a
  *     replay (same batchId) re-reads the identical range even after the
  *     log has grown — never a superset;
  *   - `prune` keeps enough tail that every replay the engine can issue
  *     (the last uncommitted batch, one back) still finds its own intent.
  */
class ConsumeStateSpec extends SparkSpec {

  private def records(n: Int, from: Int = 0) = {
    import spark.implicits._
    (from until from + n)
      .map(i => (i.toLong, s"k$i", s"v$i"))
      .toDF("ts", "key", "value")
      .withColumn("id", col("ts"))
  }

  test("replayed batch re-reads its pinned range after the log grows; prune keeps the replay tail") {
    val wh = Warehouse(tmpDir("graft-cstate"))
    TopicCatalog.createTopic(spark, wh, "t", 2)
    val stateDir = tmpDir("graft-cstate-intents")
    val fs = new Path(stateDir).getFileSystem(new Configuration())

    // batches 0..4: append 10, take a range, repeat — each batch starts
    // exactly where the previous ended (per partition)
    var prevEnd = Map.empty[Int, Long]
    val pinned = (0 to 4).map { id =>
      LogWriter.append(spark, wh, "t", records(10, from = id * 10), "id")
      val r = ConsumeState.rangesFor(spark, wh, "t", stateDir, id.toLong, Long.MaxValue)
      r.foreach { case (p, (s, _)) =>
        assert(s === prevEnd.getOrElse(p, 0L), s"batch $id partition $p continues")
      }
      prevEnd = r.map { case (p, (_, e)) => p -> e }
      assert(r.values.map { case (s, e) => e - s }.sum === 10L, s"batch $id bite")
      id.toLong -> r
    }.toMap

    // the log grows AFTER batch 4's intent was written...
    LogWriter.append(spark, wh, "t", records(40, from = 50), "id")
    // ...but a replay of batch 4 (and the one-back batch 3) re-reads the
    // PINNED range — not the grown high-water mark
    assert(ConsumeState.rangesFor(spark, wh, "t", stateDir, 4L, Long.MaxValue) === pinned(4L))
    assert(ConsumeState.rangesFor(spark, wh, "t", stateDir, 3L, Long.MaxValue) === pinned(3L))
    // and the pinned ranges read back exactly 10 records, not the new 40
    val replay = ConsumeState.boundedScan(spark, wh, "t", pinned(4L))
    assert(replay.count() === 10L)

    // prune at 4 drops only ids < 1: batch 0 gone, 1..4 kept (replay margin)
    ConsumeState.prune(stateDir, 4L)
    val kept = fs.listStatus(new Path(stateDir)).map(_.getPath.getName)
      .filter(_.startsWith("batch-")).sorted.toSeq
    assert(kept === Seq("batch-1", "batch-2", "batch-3", "batch-4"))

    // a FRESH batch after the growth picks up from batch 4's end and sees
    // the 40 new records
    val r5 = ConsumeState.rangesFor(spark, wh, "t", stateDir, 5L, Long.MaxValue)
    r5.foreach { case (p, (s, _)) => assert(s === prevEnd(p), s"p$p continues") }
    assert(r5.values.map { case (s, e) => e - s }.sum === 40L)
  }

  test("maxPerPartition caps one batch's bite; the remainder waits for the next batch") {
    val wh = Warehouse(tmpDir("graft-cstate-cap"))
    TopicCatalog.createTopic(spark, wh, "t", 1)
    LogWriter.append(spark, wh, "t",
      records(30).withColumn("explicit_partition", lit(0)), "id")
    val stateDir = tmpDir("graft-cstate-cap-intents")
    val r0 = ConsumeState.rangesFor(spark, wh, "t", stateDir, 0L, 12L)
    assert(r0 === Map(0 -> (0L, 12L)))
    val r1 = ConsumeState.rangesFor(spark, wh, "t", stateDir, 1L, 12L)
    assert(r1 === Map(0 -> (12L, 24L)))
    val r2 = ConsumeState.rangesFor(spark, wh, "t", stateDir, 2L, 12L)
    assert(r2 === Map(0 -> (24L, 30L)), "saturates at the committed end")
  }

  test("a lagging consumer's bounded scan across a live expiry returns the retained rows") {
    // the streaming twin of RetentionSpec's stale-scan test: a consumer
    // whose [start, end) range (and file list) resolved before an expiry
    // must get the retained suffix of its range, not a mid-batch crash —
    // Kafka's out-of-range-falls-to-earliest shape
    val wh = Warehouse(tmpDir("graft-cstate-lag"))
    TopicCatalog.createTopic(spark, wh, "t", 1)
    (0 until 4).foreach { i =>
      LogWriter.append(spark, wh, "t",
        records(100, from = i * 100).withColumn("explicit_partition", lit(0)), "id")
    }
    val stale = ConsumeState.boundedScan(spark, wh, "t", Map(0 -> (0L, 400L)))
    assert(graft.core.log.LogRetention
      .expireBefore(spark, wh, "t", Map(0 -> 250L)).size === 2)
    assert(stale.count() === 200)
    assert(stale.agg(min("offset")).head().getLong(0) === 200L)
  }
}
