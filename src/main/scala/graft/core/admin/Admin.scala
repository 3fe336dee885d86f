package graft.core.admin

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.log.IndexCache

/** Admin/metadata surface — the Spark-native analog of the reference's
  * FluxAdminClient + controller metadata lookups.
  *
  *   - Cluster topology (reference K1/K2: broker bootstrap + registration,
  *     src/main/java/server/internal/Cluster.java:27-94 and
  *     Broker.java:119-183): the registration/decommission LIFECYCLE belongs
  *     to Spark's cluster manager, but the queryable snapshot the reference's
  *     controller serves is reproduced here from the live executor registry —
  *     [[describeCluster]] is the `getActiveBrokers` of this architecture.
  *   - Broker-for-partition lookup (reference P5:
  *     src/main/java/producer/RecordAccumulator.java:215-235 resolves
  *     `(topic, partition) → brokerId` against the cached ClusterSnapshot):
  *     storage-attached Spark has no broker ownership of partitions — the
  *     lookup becomes `(topic, partition) → segment files`, resolved against
  *     the same driver-side index cache the read path uses. [[placement]]
  *     answers it with no Spark job, exactly as the reference answers from
  *     its cached snapshot.
  *   - Topic description (reference K7 read side,
  *     src/main/java/metadata/InMemoryTopicMetadataRepository.java:24-89):
  *     [[describeTopic]] reports per-partition file/record counts and the
  *     committed offset range.
  *
  * Everything here is metadata-scale and driver-resident: executor registry
  * rows, index-cache rows, catalog rows. No data files are opened.
  */
object Admin {

  val clusterSchema: StructType = StructType(Seq(
    StructField("executor_id", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("port", IntegerType, nullable = false),
    StructField("num_running_tasks", IntegerType, nullable = false)))

  val topicSchema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_records", LongType, nullable = false),
    StructField("base_offset", LongType, nullable = false),
    StructField("end_offset", LongType, nullable = false)))

  val placementSchema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("base_offset", LongType, nullable = false),
    StructField("end_offset", LongType, nullable = false),
    StructField("n_records", LongType, nullable = false)))

  /** One row per live executor — the "registered broker" set. In local mode
    * this is the driver itself. */
  def describeCluster(spark: SparkSession): DataFrame = {
    val infos = spark.sparkContext.statusTracker.getExecutorInfos.toSeq
    val rows = infos.map { e =>
      Row(e.host + ":" + e.port, e.host, e.port, e.numRunningTasks())
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), clusterSchema)
  }

  /** Per-partition summary of a topic's committed log: file count, record
    * count, and offset range. Partitions whose files were all expired report
    * 0 files/records with the preserved high-watermark range. Answered from
    * the driver-side index cache — no Spark job to compute. */
  def describeTopic(spark: SparkSession, wh: Warehouse, topic: String): DataFrame = {
    TopicCatalog.topicInfo(spark, wh, topic) // throws UnknownTopicException
    val rows = IndexCache.entries(spark, wh, topic)
      .groupBy(_.partition).toSeq
      .map { case (p, es) =>
        val data = es.filter(_.isData)
        Row(p, data.length.toLong, data.map(_.count).sum,
          if (data.isEmpty) es.map(_.endOffset).max + 1 else data.map(_.baseOffset).min,
          es.map(_.endOffset).max)
      }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), topicSchema)
  }

  /** Kafka's `beginningOffsets`: the earliest READABLE offset per partition
    * (rises as retention expires whole files; a fully-expired partition's
    * beginning equals its end — nothing readable, watermark preserved).
    * Driver-side index cache, no Spark job. */
  def beginningOffsets(spark: SparkSession, wh: Warehouse, topic: String): Map[Int, Long] = {
    val n = TopicCatalog.topicInfo(spark, wh, topic).numPartitions
    val fromIndex = IndexCache.entries(spark, wh, topic)
      .groupBy(_.partition)
      .map { case (p, es) =>
        val data = es.filter(_.isData)
        p -> (if (data.isEmpty) es.map(_.endOffset).max + 1 else data.map(_.baseOffset).min)
      }
    // Kafka returns an entry for EVERY partition asked about — a partition
    // never appended to begins (and ends) at 0, it does not vanish
    (0 until n).map(p => p -> fromIndex.getOrElse(p, 0L)).toMap
  }

  /** Kafka's `endOffsets`: the next offset to be assigned per partition
    * (0 for never-appended partitions). Driver-side index cache, no Spark
    * job. */
  def endOffsets(spark: SparkSession, wh: Warehouse, topic: String): Map[Int, Long] = {
    val n = TopicCatalog.topicInfo(spark, wh, topic).numPartitions
    val fromIndex = IndexCache.nextOffsets(spark, wh, topic)
    (0 until n).map(p => p -> fromIndex.getOrElse(p, 0L)).toMap
  }

  /** Consumer lag: log-end minus committed next-read offset, per partition —
    * the ops metric every consumer-group dashboard plots. A group that never
    * committed reads from each partition's BEGINNING, so its lag is
    * end − beginning (not end − 0: offsets below the retention floor are
    * unreadable and cannot be owed). */
  def consumerLag(
      spark: SparkSession,
      wh: Warehouse,
      groupId: String,
      topic: String): Map[Int, Long] = {
    val committed = graft.core.groups.ConsumerGroup.committed(spark, wh, groupId, topic)
    val begin = beginningOffsets(spark, wh, topic)
    endOffsets(spark, wh, topic).map { case (p, end) =>
      p -> math.max(0L, end - committed.getOrElse(p, begin.getOrElse(p, 0L)))
    }
  }

  /** The P5 lookup: which storage serves each (topic, partition) — one row
    * per committed segment file with its offset range. */
  def placement(spark: SparkSession, wh: Warehouse, topic: String): DataFrame = {
    TopicCatalog.topicInfo(spark, wh, topic)
    val rows = IndexCache.entries(spark, wh, topic)
      .filter(_.isData)
      .map(e => Row(e.partition, e.file, e.baseOffset, e.endOffset, e.count))
      .toSeq
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), placementSchema)
  }
}
