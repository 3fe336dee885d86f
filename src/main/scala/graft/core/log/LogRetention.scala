package graft.core.log

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.catalog.Warehouse

/** Log retention + compaction — segment lifecycle management.
  *
  * The reference rolls segments but never deletes them; retention here
  * follows the same append-only index discipline as the write path: the
  * index is the source of truth, so expiry = rewrite the index without the
  * expired files, THEN delete the data files (a crash in between leaves
  * unreferenced files, never dangling references).
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
      keepFrom: Map[Int, Long]): Seq[String] = {
    val entries = IndexCache.entries(spark, wh, topic)
    val (drop, keep) = entries.partition(e =>
      e.endOffset < keepFrom.getOrElse(e.partition, 0L))
    if (drop.isEmpty) return Seq.empty
    rewriteIndex(spark, wh, topic, keep.map(_.file).toSet)
    val conf = new Configuration()
    drop.foreach { e =>
      val p = new Path(e.file)
      p.getFileSystem(conf).delete(p, false)
    }
    IndexCache.invalidate(wh, topic)
    drop.map(_.file).toSeq
  }

  /** Log compaction: keep only the LATEST record per key per partition
    * (Kafka-style compacted topic), rewritten as fresh segments. Offsets of
    * surviving records are preserved (compaction never reassigns offsets).
    * The old files are dropped from the index, then deleted. */
  def compact(
      spark: SparkSession,
      wh: Warehouse,
      topic: String): Unit = {
    val entries = IndexCache.entries(spark, wh, topic)
    if (entries.isEmpty) return
    val before = LogReader.scan(spark, wh, topic)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("partition"), col("key"))
      .orderBy(col("offset").desc)
    val survivors = before
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val logDir = wh.logDir(topic)
    val staging = s"$logDir/../.compact_$topic"
    survivors
      .repartition(col("partition"))
      .sortWithinPartitions(col("partition"), col("offset"))
      .write.mode("overwrite").partitionBy("partition").parquet(staging)
    // swap: move staged files in, rewrite index to ONLY the new files,
    // delete old data files
    val conf = new Configuration()
    val fs = new Path(logDir).getFileSystem(conf)
    val oldFiles = entries.map(_.file).toSet
    val moved = scala.collection.mutable.ListBuffer.empty[String]
    val it = fs.listFiles(new Path(staging), true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        val partDir = f.getPath.getParent.getName // partition=<p>
        val dest = new Path(s"$logDir/$partDir/compacted-$name")
        fs.mkdirs(dest.getParent)
        fs.rename(f.getPath, dest)
        moved += dest.toString
      }
    }
    fs.delete(new Path(staging), true)
    // index the compacted files from their footers via a fresh append-style
    // entry set: rewrite index keeping entries of OTHER topics, then add new
    rewriteIndex(spark, wh, topic, keepFiles = Set.empty)
    val indexRows = moved.toSeq.map { f =>
      val st = LogWriter.footerStats(f)
      org.apache.spark.sql.Row(topic, st.partition, st.file,
        st.baseOffset, st.endOffset, st.count, null)
    }
    if (indexRows.nonEmpty)
      spark.createDataFrame(
          java.util.Arrays.asList(indexRows: _*), graft.core.Schemas.index)
        .coalesce(1)
        .write.mode("append").parquet(wh.indexDir)
    oldFiles.foreach { f =>
      val p = new Path(f)
      p.getFileSystem(conf).delete(p, false)
    }
    IndexCache.invalidate(wh, topic)
  }

  /** Rewrite the index atomically-enough: new index rows for this topic are
    * the given keep-set; other topics' rows pass through unchanged. */
  private def rewriteIndex(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      keepFiles: Set[String]): Unit = {
    val all = LogIndex.all(spark, wh)
    val kept = all.filter(col("topic") =!= topic ||
      col("file").isInCollection(
        if (keepFiles.isEmpty) Seq("__none__") else keepFiles.toSeq))
    val tmp = s"${wh.indexDir}_rewrite"
    kept.coalesce(1).write.mode("overwrite").parquet(tmp)
    val conf = new Configuration()
    val fs = new Path(wh.indexDir).getFileSystem(conf)
    fs.delete(new Path(wh.indexDir), true)
    fs.rename(new Path(tmp), new Path(wh.indexDir))
  }
}
