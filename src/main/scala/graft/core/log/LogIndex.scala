package graft.core.log

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Schemas
import graft.core.catalog.{TopicCatalog, Warehouse}

/** The per-file offset index.
  *
  * File-granularity analog of the reference's offset→byte-offset index
  * (reference: src/main/java/server/internal/storage/IndexEntries.java:17-53,
  * lookup at LogSegment.java:286-300). One row per committed Parquet file:
  * `(topic, partition, file, base_offset, end_offset, count, batch_id)`.
  * Readers prune to the files whose [base_offset, end_offset] intersects the
  * requested range — the distributed analog of `RandomAccessFile.seek`.
  *
  * Unlike the reference — where only the ACTIVE segment is readable
  * (SURVEY.md §2.7 Q2, Log.java:109-115 never consults rolled segments) —
  * this index spans every committed file, which is the intent the reference's
  * own tests assume.
  */
object LogIndex {

  def all(spark: SparkSession, wh: Warehouse): DataFrame =
    if (TopicCatalog.dirExists(wh.indexDir))
      spark.read.schema(Schemas.index).parquet(wh.indexDir)
    else
      spark.createDataFrame(java.util.List.of[Row](), Schemas.index)

  def forTopic(spark: SparkSession, wh: Warehouse, topic: String): DataFrame =
    all(spark, wh).filter(col("topic") === topic)

  /** Next offset to assign, per partition — the analog of initializing
    * `Partition.currentOffset` from `log.getLogEndOffset()`
    * (reference: src/main/java/server/internal/storage/Partition.java:18). */
  def nextOffsets(idx: DataFrame): Map[Int, Long] =
    idx.groupBy(col("partition"))
      .agg(max("end_offset").as("end"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1) + 1L))
      .toMap

  def hasBatch(idx: DataFrame, batchId: Long): Boolean =
    idx.filter(col("batch_id") === batchId).limit(1).count() > 0

  /** Committed end offset (exclusive) per partition of a topic. */
  def endOffsets(spark: SparkSession, wh: Warehouse, topic: String): Map[Int, Long] =
    nextOffsets(forTopic(spark, wh, topic))
}
