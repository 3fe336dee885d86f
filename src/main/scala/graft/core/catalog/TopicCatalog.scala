package graft.core.catalog

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Warehouse directory layout. One warehouse = one "cluster" of topics.
  *
  * {{{
  *   <root>/_catalog/topics/            topic registry (parquet)
  *   <root>/_index/<topic>/             per-file offset index (parquet)
  *   <root>/logs/<topic>/partition=<p>/ the log segments (parquet)
  * }}}
  *
  * The index is PER TOPIC: appends to different topics never touch each
  * other's index files, index rewrites (retention/compaction/deletion) are
  * serialized by the topic lock alone, and the cache-staleness fingerprint
  * lists one topic's handful of files instead of the whole cluster's.
  */
case class Warehouse(root: String) {
  def catalogDir: String = s"$root/_catalog/topics"
  def indexBase: String = s"$root/_index"
  def indexDir(topic: String): String = s"$root/_index/$topic"
  def logDir(topic: String): String = s"$root/logs/$topic"
  def partitionDir(topic: String, p: Int): String = s"${logDir(topic)}/partition=$p"
}

/** Topic lifecycle + metadata — the engine's control plane.
  *
  * Replaces the reference's controller-gated topic creation and in-memory
  * metadata repository (reference: src/main/java/server/internal/Broker.java:87-116
  * with validation :340-353; src/main/java/metadata/InMemoryTopicMetadataRepository.java:24-89).
  * Validation rules are ported 1:1: non-empty unique name, >= 1 partition,
  * 0 <= replicationFactor <= 3. Replication factor is recorded for API parity
  * but has no physical meaning here (storage redundancy belongs to the
  * filesystem under Spark).
  */
object TopicCatalog {
  /** Reference: Broker.java:54 (`MAX_REPLICATION_FACTOR = 3`). */
  val MaxReplicationFactor = 3

  /** Topic names become warehouse directory names, so they must be
    * path-safe (no separators, no leading `.`/`_` that Spark's file listing
    * or the warehouse layout treats specially) and must not collide with
    * the `*_rewrite`/`*_old` swap-staging suffixes — a topic literally
    * named `X_rewrite` would share topic X's staging dir and could have its
    * index destroyed by X's next rewrite. One policy shared with group ids
    * ([[graft.core.Names]]). */
  private[graft] def validateName(topic: String): Unit =
    graft.core.Names.check(topic).foreach(reason =>
      throw new InvalidTopicException(s"topic name '$topic' $reason"))

  def createTopic(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      numPartitions: Int,
      replicationFactor: Int = 1): FluxTopic = {
    validateName(topic)
    if (numPartitions < 1)
      throw new InvalidTopicException(s"numPartitions must be >= 1, got $numPartitions")
    if (replicationFactor < 0 || replicationFactor > MaxReplicationFactor)
      throw new InvalidTopicException(
        s"replicationFactor must be in [0, $MaxReplicationFactor], got $replicationFactor")
    if (exists(spark, wh, topic))
      throw new TopicAlreadyExistsException(s"topic '$topic' already exists")
    val row = Row(topic, numPartitions, replicationFactor, System.currentTimeMillis())
    spark.createDataFrame(java.util.List.of(row), Schemas.topics)
      .coalesce(1)
      .write.mode("append").parquet(wh.catalogDir)
    FluxTopic(topic, numPartitions, replicationFactor)
  }

  /** Finish a crashed catalog swap ([[rewriteDir]]) — without this, a crash
    * between the two renames would leave the ENTIRE topic registry
    * invisible (every topic unknown, re-creates resurrecting stale data)
    * even though the complete new registry sits in the rewrite dir. Called
    * on every catalog read path, like LogIndex.heal. */
  private def healCatalog(wh: Warehouse): Unit = {
    val p = new org.apache.hadoop.fs.Path(wh.catalogDir)
    graft.core.Swap.heal(
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()), wh.catalogDir)
  }

  /** All registered topics. Reference: InMemoryTopicMetadataRepository.getActiveTopics. */
  def topics(spark: SparkSession, wh: Warehouse): DataFrame = {
    healCatalog(wh)
    if (dirExists(wh.catalogDir)) spark.read.schema(Schemas.topics).parquet(wh.catalogDir)
    else spark.createDataFrame(java.util.List.of[Row](), Schemas.topics)
  }

  def exists(spark: SparkSession, wh: Warehouse, topic: String): Boolean =
    cachedTopics(spark, wh).contains(topic)

  // Driver-side catalog cache — the analog of the reference's singleton
  // InMemoryTopicMetadataRepository (metadata-scale), invalidated by
  // fingerprinting the catalog dir listing so cross-JVM creates are seen.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, (String, Map[String, FluxTopic])]

  /** Observer invoked with the fresh topic snapshot when a catalog CHANGE is
    * detected (a reload whose fingerprint differs from the cached one) — the
    * analog of the reference's metadata listeners, notified with the new
    * `ClusterSnapshot` on change (reference:
    * src/main/java/metadata/Metadata.java:86-93,120-152; the producer swaps
    * its routing snapshot in such a callback, FluxProducer.java:254-259).
    * Pull-based: the callback fires on the next catalog access that observes
    * the change, not on a background thread. */
  type Listener = Map[String, FluxTopic] => Unit

  private val listeners =
    scala.collection.concurrent.TrieMap.empty[String, List[Listener]]

  def addListener(wh: Warehouse, l: Listener): Unit =
    listeners.updateWith(wh.root)(cur => Some(l :: cur.getOrElse(Nil)))

  def removeListeners(wh: Warehouse): Unit = listeners.remove(wh.root)

  private def catalogFingerprint(wh: Warehouse): String = {
    healCatalog(wh)
    val p = new org.apache.hadoop.fs.Path(wh.catalogDir)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(p)) ""
    else fs.listStatus(p).filterNot(_.getPath.getName.startsWith("_"))
      .map(s => s"${s.getPath.getName}:${s.getLen}").sorted.mkString(",")
  }

  private def cachedTopics(spark: SparkSession, wh: Warehouse): Map[String, FluxTopic] = {
    val fp = catalogFingerprint(wh)
    cache.get(wh.root) match {
      case Some((f, m)) if f == fp => m
      case prev =>
        val m = topics(spark, wh).collect()
          .map(r => r.getString(0) -> FluxTopic(r.getString(0), r.getInt(1), r.getInt(2)))
          .toMap
        cache.put(wh.root, (fp, m))
        // notify on CHANGE (had a snapshot, it differs), not on first load —
        // mirrors the reference's notifyListeners on metadata updates
        if (prev.isDefined)
          listeners.getOrElse(wh.root, Nil).foreach(_.apply(m))
        m
    }
  }

  /** Reference: InMemoryTopicMetadataRepository.getPartitionsFor. */
  def topicInfo(spark: SparkSession, wh: Warehouse, topic: String): FluxTopic =
    cachedTopics(spark, wh).getOrElse(topic,
      throw new UnknownTopicException(s"unknown topic '$topic'"))

  def numPartitions(spark: SparkSession, wh: Warehouse, topic: String): Int =
    topicInfo(spark, wh, topic).numPartitions

  /** Delete a topic under its topic lock: index dir first (readers go
    * blind), then the data files, then the catalog row. A crash mid-way
    * leaves a still-registered topic with a partial/empty log — re-running
    * deleteTopic finishes the job — and never an unregistered name whose
    * stale index/data a re-create would resurrect. The per-topic index dir
    * makes this a plain recursive delete: no other topic's rows are ever
    * rewritten (and so cannot be lost to a concurrent append). */
  def deleteTopic(spark: SparkSession, wh: Warehouse, topic: String): Unit = {
    if (!exists(spark, wh, topic))
      throw new UnknownTopicException(s"unknown topic '$topic'")
    val n = numPartitions(spark, wh, topic)
    graft.core.Locks.withTopicLock(wh, topic, n) {
      val conf = new org.apache.hadoop.conf.Configuration()
      val idx = new org.apache.hadoop.fs.Path(wh.indexDir(topic))
      val fs = idx.getFileSystem(conf)
      // leftover rewrite staging goes FIRST: if we crashed after deleting the
      // live dir but before the stale staging, the next reader's heal() would
      // rename the staging back and resurrect the index of a deleted topic
      fs.delete(new org.apache.hadoop.fs.Path(s"${wh.indexDir(topic)}_rewrite"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"${wh.indexDir(topic)}_old"), true)
      fs.delete(idx, true)
      graft.core.log.IndexCache.invalidate(wh, topic)
      fs.delete(new org.apache.hadoop.fs.Path(wh.logDir(topic)), true)
      val keptTopics = topics(spark, wh).filter(col("topic") =!= topic)
      rewriteDir(spark, keptTopics, wh.catalogDir)
    }
  }

  /** Swap `dir` to the materialized `df` — the shared reader-safe protocol
    * ([[graft.core.Swap]]); crash mid-swap is finished by [[healCatalog]]. */
  private def rewriteDir(spark: SparkSession, df: DataFrame, dir: String): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(graft.core.Swap.rewriteDir(dir))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    graft.core.Swap.install(fs, dir)
  }

  /** Register every topic as a SQL temp view named `topic_<name>`, backed by
    * the indexed log scan — the engine's `spark.sql` surface over topics. */
  def registerViews(spark: SparkSession, wh: Warehouse): Seq[String] = {
    import graft.core.log.LogReader
    topics(spark, wh).select("topic").collect().map(_.getString(0)).toSeq.map { t =>
      val view = s"topic_$t"
      LogReader.scan(spark, wh, t).createOrReplaceTempView(view)
      view
    }
  }

  private[graft] def dirExists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.exists(p)
  }
}
