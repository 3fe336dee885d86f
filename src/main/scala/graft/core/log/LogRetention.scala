package graft.core.log

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Locks
import graft.core.catalog.Warehouse

/** Log retention + compaction — segment lifecycle management.
  *
  * The reference rolls segments but never deletes them; retention here
  * follows the same index-first discipline as the write path: the index is
  * the source of truth, so expiry = swap in a new index without the expired
  * files, THEN delete the data files (a crash in between leaves unreferenced
  * files, never dangling references). Both operations run under the topic
  * lock — an append between the index snapshot and the swap would otherwise
  * have its freshly-committed rows erased by the swap, permanently orphaning
  * its data.
  *
  * When retention removes a partition's LAST file, a high-watermark
  * tombstone row ([[LogIndex.HwmFile]]) retains the log-end offset so the
  * next append continues monotonically instead of restarting at 0 (committed
  * consumer offsets stay valid — the reference/Kafka persist the log-end
  * offset independently of segments).
  */
object LogRetention {

  /** Drop whole files whose offset range lies entirely below the
    * per-partition watermark (offsets < keepFrom(partition)). Partial files
    * are kept — offsets stay dense and file-aligned, like Kafka's
    * segment-granularity retention. Returns the deleted files. */
  def expireBefore(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      keepFrom: Map[Int, Long]): Seq[String] =
    Locks.withTopicLock(wh, topic,
        graft.core.catalog.TopicCatalog.numPartitions(spark, wh, topic)) {
    val entries = IndexCache.entries(spark, wh, topic)
    val (drop, keep) = entries.filter(_.isData).partition(e =>
      e.endOffset < keepFrom.getOrElse(e.partition, 0L))
    if (drop.isEmpty) return Seq.empty

    // partitions losing their last data file get (or keep) a high-watermark
    // tombstone carrying max(end_offset) over everything the partition had
    val keptParts = keep.map(_.partition).toSet
    val hwmRows = entries.groupBy(_.partition).collect {
      case (p, es) if !keptParts.contains(p) =>
        LogIndex.hwmRow(topic, p, es.map(_.endOffset).max)
    }.toSeq

    val keepFiles = keep.map(_.file).toSet
    val keptRows = LogIndex.forTopic(spark, wh, topic)
      .filter(col("count") > 0 &&
        (if (keepFiles.isEmpty) lit(false)
         else col("file").isInCollection(keepFiles.toSeq)))
    val hwmDf = spark.createDataFrame(
      java.util.Arrays.asList(hwmRows: _*), graft.core.Schemas.index)
    LogIndex.replace(spark, wh, topic, keptRows.unionByName(hwmDf))

    val conf = new Configuration()
    drop.foreach { e =>
      val p = new Path(e.file)
      p.getFileSystem(conf).delete(p, false)
    }
    drop.map(_.file).toSeq
  }

  /** Time-based retention — the reference/Kafka `retention.ms` policy:
    * expire whole files whose records ALL predate `nowMs - retentionMs`.
    * The per-partition watermark is the earliest offset still inside the
    * window ([[LogReader.offsetsForTimes]] — one indexed job with the ts
    * predicate on row-group stats); a partition with nothing inside the
    * window expires everything, its high-watermark tombstone preserving the
    * log end. BOTH the watermark read and the expiry run inside the topic
    * lock (the nested [[expireBefore]] re-enters reentrantly): computing
    * watermarks outside it would let an append land between the two reads
    * and have its fresh, fully-in-window segment swept by a stale
    * "expire everything" decision. */
  def expireOlderThan(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      retentionMs: Long,
      nowMs: Long = System.currentTimeMillis()): Seq[String] =
    Locks.withTopicLock(wh, topic,
        graft.core.catalog.TopicCatalog.numPartitions(spark, wh, topic)) {
      val threshold = nowMs - retentionMs
      val keepFrom = LogReader.offsetsForTimes(spark, wh, topic, threshold)
      val ends = IndexCache.nextOffsets(spark, wh, topic) // cached, no job
      val full = ends.map { case (p, end) => p -> keepFrom.getOrElse(p, end) }
      expireBefore(spark, wh, topic, full)
    }

  /** Garbage-collect a topic's UNREFERENCED storage: data files in live
    * partition dirs that no index row points to (a crashed append that died
    * between the staged-file rename and the index-delta write), and
    * leftover `.staging-*` / `.compact-*` dirs from appends that died
    * mid-write. Readers only ever see indexed files, so orphans are
    * invisible — but at 100 TB every crashed job's output is real money on
    * disk forever. Runs under the full topic lock (an in-flight append's
    * just-renamed, not-yet-indexed files must not be swept: the lock
    * guarantees no append is between those two steps). Returns deleted
    * paths. */
  def vacuum(spark: SparkSession, wh: Warehouse, topic: String): Seq[String] =
    Locks.withTopicLock(wh, topic,
        graft.core.catalog.TopicCatalog.numPartitions(spark, wh, topic)) {
      val conf = new Configuration()
      val logDir = new Path(wh.logDir(topic))
      val fs = logDir.getFileSystem(conf)
      if (!fs.exists(logDir)) return Seq.empty
      val indexed = IndexCache.entries(spark, wh, topic).filter(_.isData)
        .map(e => new Path(e.file).toUri.getPath).toSet
      val deleted = Seq.newBuilder[String]
      // crashed index-delta staging (writeIndexDelta died between its
      // parquet write and the rename-in): `.delta=<topic>=<uid>` dirs under
      // the index base. `=` cannot appear in a validated topic name, so the
      // prefix match can never claim another topic's in-flight delta.
      val indexBase = new Path(wh.indexBase)
      if (fs.exists(indexBase)) {
        fs.listStatus(indexBase).foreach { d =>
          if (d.isDirectory && d.getPath.getName.startsWith(s".delta=$topic=")) {
            fs.delete(d.getPath, true)
            deleted += d.getPath.toString
          }
        }
      }
      fs.listStatus(logDir).foreach { top =>
        val name = top.getPath.getName
        if (top.isDirectory && (name.startsWith(".staging-") || name.startsWith(".compact-"))) {
          // a LIVE append's staging dir cannot exist here: we hold every
          // partition lock, so any staging dir is a crashed append's
          fs.delete(top.getPath, true)
          deleted += top.getPath.toString
        } else if (top.isDirectory && name.startsWith("partition=")) {
          fs.listStatus(top.getPath).foreach { f =>
            val fn = f.getPath.getName
            if (!f.isDirectory && !fn.startsWith("_") && !fn.startsWith(".") &&
                !indexed.contains(f.getPath.toUri.getPath)) {
              fs.delete(f.getPath, false)
              deleted += f.getPath.toString
            }
          }
        }
      }
      deleted.result()
    }

  /** Log compaction: keep only the LATEST record per key per partition
    * (Kafka-style compacted topic), rewritten as fresh segments. Offsets of
    * surviving records are preserved (compaction never reassigns offsets).
    * The new index — compacted file entries plus any surviving tombstones —
    * lands in ONE swap, so there is no window where the topic's index is
    * empty; old data files are deleted last. */
  def compact(
      spark: SparkSession,
      wh: Warehouse,
      topic: String): Unit =
    Locks.withTopicLock(wh, topic,
        graft.core.catalog.TopicCatalog.numPartitions(spark, wh, topic)) {
    val entries = IndexCache.entries(spark, wh, topic)
    val dataEntries = entries.filter(_.isData)
    if (dataEntries.isEmpty) return
    val before = LogReader.scan(spark, wh, topic)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("partition"), col("key"))
      .orderBy(col("offset").desc)
    val survivors = before
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val logDir = wh.logDir(topic)
    val staging =
      s"$logDir/.compact-${java.util.UUID.randomUUID().toString.take(8)}"
    survivors
      .repartition(col("partition"))
      .sortWithinPartitions(col("partition"), col("offset"))
      .write.mode("overwrite").partitionBy("partition").parquet(staging)
    val moved = LogWriter.commitStaged(staging, logDir)

    val movedParts = scala.collection.mutable.Set.empty[Int]
    val indexRows: Seq[Row] = moved.map { f =>
      val st = LogWriter.footerStats(f)
      movedParts += st.partition
      Row(topic, st.partition, st.file, st.baseOffset, st.endOffset, st.count, null)
    }
    // tombstones of partitions with no compacted data survive the rewrite
    val hwmRows = entries.collect {
      case e if !e.isData && !movedParts.contains(e.partition) =>
        LogIndex.hwmRow(topic, e.partition, e.endOffset)
    }.toSeq
    LogIndex.replace(spark, wh, topic,
      spark.createDataFrame(
        java.util.Arrays.asList((indexRows ++ hwmRows): _*),
        graft.core.Schemas.index))

    val conf = new Configuration()
    dataEntries.foreach { e =>
      val p = new Path(e.file)
      p.getFileSystem(conf).delete(p, false)
    }
  }
}
