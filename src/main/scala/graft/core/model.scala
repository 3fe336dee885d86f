package graft.core

import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * Re-expresses the reference's record/topic/partition abstractions
  * (reference: src/main/java/producer/ProducerRecord.java:19-33,
  * src/main/java/consumer/ConsumerRecord.java:8-16,
  * src/main/java/commons/FluxTopic.java:7-16,
  * src/main/java/commons/TopicPartition.java:9-24) as Spark schemas and
  * case classes. Offsets are widened to Long everywhere (the reference's
  * int32 offsets do not survive 100 TB scale).
  */

/** A record header. Reference: src/main/java/commons/header/Header.java:3-18.
  * Headers are ordered and duplicate keys are allowed, so the column type is
  * an array-of-struct, not a map.
  */
case class FluxHeader(key: String, value: Array[Byte])

/** Producer-side record (no offset yet).
  * Reference: src/main/java/producer/ProducerRecord.java:19-53 — topic,
  * optional explicit partition, epoch-millis timestamp (auto-stamped when
  * absent), optional key, required value, ordered headers.
  */
case class ProducerRecord(
    topic: String,
    partition: Option[Int],
    ts: Option[Long],
    key: Option[String],
    value: String,
    headers: Seq[FluxHeader] = Seq.empty)

/** Consumer-side record: same shape plus the assigned dense offset.
  * Reference: src/main/java/consumer/ConsumerRecord.java:8-16.
  */
case class FluxRecord(
    topic: String,
    partition: Int,
    offset: Long,
    ts: Long,
    key: Option[String],
    value: String,
    headers: Seq[FluxHeader] = Seq.empty)

/** Compound log-coordinate key.
  * Reference: src/main/java/commons/TopicPartition.java:9-24. */
case class TopicPartition(topic: String, partition: Int)

/** Topic metadata. Reference: src/main/java/commons/FluxTopic.java:7-16. */
case class FluxTopic(topic: String, numPartitions: Int, replicationFactor: Int)

object Schemas {
  /** ArrayType(Struct(key, value)) — preserves header order + duplicates. */
  val headers: ArrayType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", BinaryType, nullable = true))),
    containsNull = false)

  /** Canonical log-table schema. The `partition` column doubles as the
    * physical partition directory (logs/<topic>/partition=<p>/...). */
  val record: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true),
    StructField("headers", headers, nullable = true)))

  /** Per-file offset index — the analog of the reference's .index files
    * (src/main/java/server/internal/storage/IndexEntries.java:17-53), lifted
    * from record granularity to file granularity: Parquet row-group stats
    * handle intra-file seeks, this table prunes files without listing or
    * scanning the log directory. */
  val index: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("base_offset", LongType, nullable = false),
    StructField("end_offset", LongType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("batch_id", LongType, nullable = true)))

  /** Topic-catalog schema. Reference metadata repo:
    * src/main/java/metadata/InMemoryTopicMetadataRepository.java:24-89. */
  val topics: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("num_partitions", IntegerType, nullable = false),
    StructField("replication_factor", IntegerType, nullable = false),
    StructField("created_ts", LongType, nullable = false)))
}

/** Producer tuning knobs that still mean something on Spark; defaults mirror
  * the reference (src/main/java/producer/ProducerConfig.java:22-30). The
  * batching/buffering machinery itself (RecordAccumulator, BufferPool) is
  * deliberately NOT ported — micro-batches and Tungsten own those concerns.
  */
case class ProducerConfig(
    lingerMs: Long = 100L,          // trigger interval for streaming ingest
    maxRecordsPerFile: Long = 5000000L, // segment-size analog (was 1 MiB files)
    compression: String = "zstd")   // parquet codec; reference: CompressionType

/** Broker liveness knobs; defaults mirror the reference
  * (src/main/java/server/config/BrokerConfig.java:17-22): heartbeat every
  * 3 s, offline after 3 missed beats. */
case class LivenessConfig(
    heartbeatIntervalMs: Long = 3000L,
    missedThreshold: Int = 3) {
  def timeoutMs: Long = heartbeatIntervalMs * missedThreshold
}

class InvalidTopicException(msg: String) extends IllegalArgumentException(msg)
class TopicAlreadyExistsException(msg: String) extends IllegalArgumentException(msg)
class UnknownTopicException(msg: String) extends IllegalArgumentException(msg)
