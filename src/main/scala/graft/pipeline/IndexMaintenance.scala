package graft.pipeline

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared compaction for the partitioned on-disk indexes ([[LshIndex]],
  * [[SrpIndex]], [[IvfIndex]]).
  *
  * Every `append` on those indexes adds one file per hit partition
  * directory per batch — the right write shape for ingest (touch only the
  * new rows), but after thousands of crawl batches the probe side pays an
  * open-per-file cost that grows without bound. Compaction is the
  * maintenance counterpart: rewrite each directory that has accumulated
  * more than `minFiles` data files into a single file, preserving (and
  * de-duplicating — see below) its rows.
  *
  * Shape: one bounded driver listing of the partition directories, then
  * per directory an isolated read → single-file staging write → move-in →
  * delete-old sequence (the rename-aside discipline of
  * [[graft.core.log.LogRetention.compact]], confined to one directory at a
  * time so the index stays live and a crash can damage at most one
  * directory). Directories are independent — a scheduler may compact them
  * concurrently; this driver loop runs them serially for determinism.
  *
  * Crash contract (single maintainer, same assumption as `append` — the
  * indexes are owned by one curation pipeline): a crash between the
  * move-in and the old-file deletes leaves BOTH copies of a directory's
  * rows. For [[LshIndex]]/[[SrpIndex]] that is harmless by construction —
  * probes already tolerate duplicate rows from replayed appends
  * (distinct-id bucket guards, by-id verify dedupe); for [[IvfIndex]] a
  * torn window can transiently duplicate top-k candidates. Re-running
  * compact converges every case to exactly one copy: the per-table
  * `dedupe` collapses replay/torn duplicates during the rewrite, so
  * compaction doubles as garbage collection for replayed-append rows.
  */
object IndexMaintenance {

  /** What one [[compactTable]] run did. */
  final case class CompactStats(dirsCompacted: Int, filesRemoved: Int) {
    def +(o: CompactStats): CompactStats =
      CompactStats(dirsCompacted + o.dirsCompacted,
        filesRemoved + o.filesRemoved)
  }

  private def dataFiles(fs: FileSystem, dir: Path): Seq[Path] =
    fs.listStatus(dir).toSeq
      .filter(s => !s.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        !n.startsWith("_") && !n.startsWith(".")
      }

  /** Compact every `col=value` partition directory under `table` holding
    * more than `minFiles` data files. `dedupe` runs on each directory's
    * rows during the rewrite (partition column excluded — it lives in the
    * directory name and is re-implied by writing back into the same
    * directory). */
  def compactTable(
      spark: SparkSession,
      table: String,
      dedupe: DataFrame => DataFrame,
      minFiles: Int = 2): CompactStats = {
    val root = new Path(table)
    val fs = root.getFileSystem(new Configuration())
    if (!fs.exists(root)) return CompactStats(0, 0)
    val partDirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath)
    var stats = CompactStats(0, 0)
    partDirs.foreach { dir =>
      val old = dataFiles(fs, dir)
      if (old.size >= minFiles) {
        val tag = UUID.randomUUID().toString.take(8)
        val staging = new Path(root, s".compact-$tag")
        try {
          dedupe(spark.read.parquet(old.map(_.toString): _*))
            .coalesce(1)
            .write.mode("overwrite").parquet(staging.toString)
          val part = dataFiles(fs, staging).headOption.getOrElse(
            throw new IllegalStateException(
              s"compact: staging write produced no data file under $staging"))
          val target = new Path(dir, s"part-00000-compact-$tag.parquet")
          if (!fs.rename(part, target))
            throw new IllegalStateException(s"compact: failed to install $target")
          // from here the directory is a superset (old + compacted) — every
          // read stays correct; the deletes shrink it back to one copy
          old.foreach(p => fs.delete(p, false))
          stats = stats + CompactStats(1, old.size)
        } finally fs.delete(staging, true)
      }
    }
    stats
  }
}
