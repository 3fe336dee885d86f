package graft.core.log

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.catalog.Warehouse

/** The consume path: index-pruned incremental reads over a topic's log.
  *
  * Re-expresses the reference's fetch chain
  * (reference: src/main/java/consumer/FluxConsumer.java:136-179 →
  * grpc/services/ConsumerServiceImpl.java:17-45 →
  * server/internal/storage/LogSegment.java:278-339): the in-memory index map
  * + `RandomAccessFile.seek` becomes file pruning against [[LogIndex]]
  * followed by a Parquet scan whose `offset >= from` filter is pushed to
  * row-group stats (tight, because files are written offset-sorted).
  *
  * `poll` takes explicit (topic, partition, fromOffset) — the reference's
  * request drops topic/partition on the floor and the broker guesses
  * "first topic, partition 0" (SURVEY.md §2.7 Q3); we keep the intended
  * contract. Records come back strictly offset-ordered (FluxConsumer.java:165)
  * and the sort runs only over the pruned file set, never the whole log.
  */
object LogReader {

  /** Fetch up to `max` records of one partition starting at `fromOffset` —
    * the reference's `poll` (one micro-slice of the log, offset-ordered). */
  def poll(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      partition: Int,
      fromOffset: Long,
      max: Long): DataFrame = {
    val to = fromOffset + max // exclusive
    // prune in-driver against the cached index — no Spark job; the poll
    // itself is then ONE job over just the intersecting files
    val hits = IndexCache.entries(spark, wh, topic)
      .filter(e => e.isData && e.partition == partition &&
        e.endOffset >= fromOffset && e.baseOffset < to)
    if (hits.isEmpty) emptyLog(spark, wh, topic)
    else {
      // schema pinned (Schemas.record; `partition` resolves from the
      // directory) — a poll is a point read, it must not pay a footer
      // schema-inference pass per call
      val slice = spark.read
        .option("basePath", wh.logDir(topic))
        .schema(graft.core.Schemas.record)
        .parquet(hits.map(_.file).toIndexedSeq: _*)
        .filter(col("offset") >= fromOffset && col("offset") < to)
      // a poll slice is bounded by `max` (and by the pruned files' record
      // count, known from the index): sort it in ONE task instead of a
      // range-exchange — a global orderBy shuffles every poll, pure fixed
      // overhead for a micro-slice. Unbounded polls (pollAll-style max)
      // over big windows keep the distributed sort.
      val sliceRows = math.min(max, hits.map(_.count).sum)
      if (sliceRows <= SinglePartitionSortRows)
        slice.coalesce(1).sortWithinPartitions(col("offset"))
      else slice.orderBy(col("offset"))
    }
  }

  /** Poll slices at or under this many rows sort in a single task (the
    * slice is output-scale — it gets collected or appended either way);
    * larger windows fall back to the distributed range sort. */
  private val SinglePartitionSortRows = 1L << 22

  /** Kafka's `offsetsForTimes` analog: per partition, the earliest offset
    * whose record timestamp is at or after `tsMs` (empty entry when the
    * partition has no such record). One job over the indexed files with the
    * ts predicate pushed to parquet row-group statistics — records append
    * in arrival order, so per-file ts stats are tight and the segment files
    * themselves serve as the time index (the role of Kafka's .timeindex). */
  def offsetsForTimes(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      tsMs: Long): Map[Int, Long] =
    scan(spark, wh, topic)
      .filter(col("ts") >= tsMs)
      .groupBy(col("partition"))
      .agg(min(col("offset")).as("first_offset"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap

  /** All committed records of a topic from the given per-partition offsets
    * (exclusive lower bounds come from a group's committed offsets). The
    * returned frame is the topic "table" the query layer runs over. */
  def scan(spark: SparkSession, wh: Warehouse, topic: String): DataFrame = {
    val files = IndexCache.entries(spark, wh, topic).filter(_.isData).map(_.file)
    if (files.isEmpty) emptyLog(spark, wh, topic)
    else spark.read.option("basePath", wh.logDir(topic))
      // pinned like `poll`: the query layer calls scan constantly and a
      // footer schema-inference pass per call is pure fixed overhead
      .schema(graft.core.Schemas.record)
      .parquet(files.toIndexedSeq: _*)
  }

  /** Incremental read: every record with `offset >= from(partition)` —
    * the batch form of a consumer-group member catching up. */
  def scanFrom(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      from: Map[Int, Long]): DataFrame = {
    val files = IndexCache.entries(spark, wh, topic)
      .filter(e => e.isData && e.endOffset >= from.getOrElse(e.partition, 0L))
      .map(_.file)
    if (files.isEmpty) emptyLog(spark, wh, topic)
    else {
      val lower = from.foldLeft(lit(0L)) { case (acc, (p, o)) =>
        when(col("partition") === p, lit(o)).otherwise(acc)
      }
      spark.read.option("basePath", wh.logDir(topic))
        .schema(graft.core.Schemas.record)
        .parquet(files.toIndexedSeq: _*)
        .filter(col("offset") >= lower)
    }
  }

  private def emptyLog(spark: SparkSession, wh: Warehouse, topic: String): DataFrame =
    spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](), graft.core.Schemas.record)
}
