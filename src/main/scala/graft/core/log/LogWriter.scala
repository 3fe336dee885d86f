package graft.core.log

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.routing.PartitionRouter

/** Result of one append: per-partition assigned offset ranges. */
case class AppendResult(
    topic: String,
    batchId: Option[Long],
    ranges: Map[Int, (Long, Long)], // partition -> (baseOffset, endOffset) inclusive
    records: Long)

/** The produce path: route → assign dense per-partition offsets → append
  * Parquet segments → index.
  *
  * Re-expresses the reference's broker ingest chain
  * (reference: src/main/java/server/internal/Broker.java:401-419 →
  * commons/utils/PartitionWriteManager.java:33-84 →
  * server/internal/storage/Log.java:93-103 → LogSegment.java:135-239):
  *
  *   - The per-partition fair lock + AtomicInteger offset counter becomes a
  *     range exchange on `(partition, ord)` plus a two-pass count /
  *     prefix-sum / number scheme ([[assignOffsets]]) seeded from the
  *     per-partition max offset in the index — dense per-partition numbering
  *     WITHOUT funneling any partition through a single task.
  *   - Segment files + 512 KiB flush buffers become immutable Parquet files;
  *     sizing via `maxRecordsPerFile` replaces the 1 MiB roll threshold.
  *   - The offset→byte index (IndexEntries.java:17-53) becomes a per-FILE
  *     offset-range table; Parquet row-group stats (tight, because each file
  *     is sorted by offset) do the intra-file seeking.
  *
  * Readers only see files through the index, and the index row is written
  * after the data: a crashed append leaves orphan files that are never read,
  * and a replayed `batchId` is skipped — that is the exactly-once contract
  * for `foreachBatch` ingestion (SURVEY.md §7.4.2).
  *
  * Commit cost is independent of topic size: each batch writes into a fresh
  * staging dir (listing it is O(files in THIS batch)) and the files are
  * renamed into the live partition dirs — never a before/after walk of the
  * whole topic tree. The index delta is one small file per append, and the
  * topic's index auto-compacts past [[LogWriter.MaxIndexFiles]] deltas, so
  * the driver-side index reload stays bounded at millions of segments.
  *
  * Cross-job writes are serialized per (topic, partition) with warehouse
  * lock files ([[graft.core.Locks]]), matching the reference's
  * per-partition write unit: appends to different topics — or to disjoint
  * DECLARED partition sets of one topic — proceed fully in parallel, while
  * topic-wide mutations (retention/compaction/delete) take every
  * partition's lock.
  */
object LogWriter {

  /** Route records and assign dense, gapless per-partition offsets starting
    * from the given bases — the pure transform at the core of the produce
    * path, exposed separately so it can be verified against a SQL oracle
    * without touching disk.
    *
    * NOT a `row_number()` window: `Window.partitionBy(partition)` funnels
    * each topic-partition through one task — and when a caller pins
    * `explicit_partition = lit(p)`, Catalyst constant-folds the routed
    * column, the window's partition spec collapses to EMPTY, and the entire
    * batch serializes through a single task ("WindowExec: No Partition
    * Defined") — a scale-killer on the one path built for parallel ingest.
    * Instead this numbers in two metadata-scale passes over ONE range
    * exchange:
    *
    *   1. `repartitionByRange(partition, ord)` + per-task sort puts every
    *      task in charge of a contiguous (partition, ord) range — a single
    *      partition's multi-GB batch spreads across MANY tasks (AQE
    *      coalesces the range partitions for small batches).
    *   2. A count job collects per-task per-partition run lengths (one tiny
    *      tuple per task); the driver prefix-sums them into per-task base
    *      offsets (O(tasks × partitions-per-task), metadata-scale).
    *   3. A numbering pass re-reads the SAME shuffle output (same RDD
    *      lineage, so the exchange stage is skipped, not recomputed) and
    *      stamps `base + local index` per row.
    *
    * The result is exactly the window semantics — dense offsets in `ord`
    * order per partition — with no single-task funnel anywhere. The returned
    * frame is eagerly numbered (the count pass runs at call time).
    *
    * @param df      input records
    * @param explicitPartition explicit-partition column (null when absent)
    * @param key     routing key column (null when absent)
    * @param ord     total-order column fixing intra-partition arrival order
    *                (the reference serializes arrival with a lock; a
    *                distributed engine needs the order to be data-derived)
    * @param numPartitions topic partition count
    * @param bases   partition -> next offset to assign (default all 0)
    * @param parallelism fixed range-task count (tests); None = session
    *                shuffle partitions with AQE coalescing
    */
  def assignOffsets(
      df: DataFrame,
      explicitPartition: Column,
      key: Column,
      ord: Column,
      numPartitions: Int,
      bases: Map[Int, Long] = Map.empty,
      parallelism: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val routed = df.withColumn(
      "partition",
      PartitionRouter.route(explicitPartition, key, ord, numPartitions))
    val sorted = (parallelism match {
      case Some(k) => routed.repartitionByRange(k, col("partition"), ord)
      case None => routed.repartitionByRange(col("partition"), ord)
    }).sortWithinPartitions(col("partition"), ord)
    val schema = sorted.schema
    val pIdx = schema.fieldIndex("partition")
    // One lineage over the UNSAFE rows (queryExecution.toRdd): numbering
    // reuses the count job's shuffle AND neither pass pays the external-Row
    // decode — `.rdd` would deserialize every column of every record twice
    // (count + number) and re-encode once, which showed up as ~15% of the
    // whole produce path at bench scale.
    val rdd = sorted.queryExecution.toRdd
    val counts: Array[Array[(Int, Long)]] = rdd
      .mapPartitionsWithIndex { (i, it) =>
        // rows arrive grouped by partition (per-task sort) — count the runs
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        var cur = Int.MinValue
        var c = 0L
        it.foreach { r =>
          val p = r.getInt(pIdx)
          if (p != cur) { if (c > 0) runs += ((cur, c)); cur = p; c = 0L }
          c += 1
        }
        if (c > 0) runs += ((cur, c))
        Iterator((i, runs.toArray))
      }
      .collect().sortBy(_._1).map(_._2)
    val running = scala.collection.mutable.Map.empty[Int, Long]
    bases.foreach { case (p, b) => running(p) = b }
    val starts: Array[Map[Int, Long]] = counts.map { runs =>
      runs.map { case (p, c) =>
        val s = running.getOrElse(p, 0L)
        running(p) = s + c
        p -> s
      }.toMap
    }
    val bStarts = spark.sparkContext.broadcast(starts)
    val outSchema = schema.add("offset", org.apache.spark.sql.types.LongType,
      nullable = false)
    val numbered = rdd.mapPartitionsWithIndex { (i, it) =>
      import org.apache.spark.sql.catalyst.expressions.{
        GenericInternalRow, JoinedRow, UnsafeProjection}
      val next = scala.collection.mutable.Map.empty[Int, Long]
      bStarts.value(i).foreach { case (p, s) => next(p) = s }
      // append `offset` with an unsafe projection over (row ++ [offset]) —
      // no per-row Seq/Row allocation; the projection's reused buffer is
      // safe for the immediate narrow consumer (Spark operators copy where
      // buffering requires it)
      val proj = UnsafeProjection.create(outSchema)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow()
      it.map { r =>
        val p = r.getInt(pIdx)
        val o = next(p)
        next(p) = o + 1
        extra.update(0, o)
        proj(joined(r, extra)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.GraftInternal.internalCreateDataFrame(
      spark, numbered, outSchema)
  }

  /** Append a batch of records to a topic's log.
    *
    * Input columns: `ts` (long millis), `key` (string, nullable), `value`
    * (string), optional `headers`, optional `explicit_partition` (int), and
    * an ordering column named by `ordCol`.
    *
    * @param partitions when given, the append declares it only writes these
    *                   partitions and takes ONLY those partitions' locks —
    *                   appends from different jobs into disjoint partitions
    *                   of one topic run concurrently, the reference's
    *                   per-partition write parallelism
    *                   (PartitionWriteManager.java:33-84). Enforcement is on
    *                   the ROUTED outcome: any record that routes outside
    *                   the declared set aborts the append before anything
    *                   commits (callers normally pin routing with
    *                   `explicit_partition`; a record without it whose hash
    *                   route happens to land inside the set is accepted).
    *                   When absent the append routes freely and holds every
    *                   partition lock.
    */
  def append(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      records: DataFrame,
      ordCol: String,
      batchId: Option[Long] = None,
      conf: ProducerConfig = ProducerConfig(),
      partitions: Option[Seq[Int]] = None): AppendResult = {
    val n = TopicCatalog.numPartitions(spark, wh, topic)
    val locked: Seq[Int] = partitions match {
      case Some(ps) =>
        require(ps.nonEmpty, "declared partition set must be non-empty")
        require(ps.forall(p => p >= 0 && p < n),
          s"declared partitions ${ps.mkString(",")} outside [0, $n)")
        ps.distinct.sorted
      case None => 0 until n
    }
    val result = graft.core.Locks.withPartitionLocks(wh, topic, locked) {
      batchId.foreach { id =>
        // cache-based replay check (driver-side index read): the DataFrame
        // form cost one Spark job per batch-keyed append — fixed scheduler
        // overhead on every streaming micro-batch
        if (IndexCache.hasBatch(spark, wh, topic, id, partitions))
          return AppendResult(topic, batchId, Map.empty, 0L)
      }
      val bases = IndexCache.nextOffsets(spark, wh, topic)
      val explicitP =
        if (records.columns.contains("explicit_partition")) col("explicit_partition")
        else lit(null).cast("int")
      val keyCol =
        if (records.columns.contains("key")) col("key") else lit(null).cast("string")
      val assigned = assignOffsets(
        records, explicitP, keyCol, col(ordCol), n, bases)
        .withColumn("ts",
          if (records.columns.contains("ts")) col("ts").cast("long")
          else lit(System.currentTimeMillis()))
        .withColumn("key", keyCol.cast("string"))
        .withColumn("headers",
          if (records.columns.contains("headers")) col("headers")
          else lit(null).cast(Schemas.headers))
        .select(col("partition"), col("offset"), col("ts"), col("key"),
          col("value").cast("string"), col("headers"))

      val logDir = wh.logDir(topic)
      // Stage into a dot-dir inside the topic dir, then rename the files
      // into the live partition dirs: new-file discovery lists ONLY the
      // staging dir — O(files in this batch), not O(files ever written).
      val staging =
        s"$logDir/.staging-${java.util.UUID.randomUUID().toString.take(8)}"
      // No re-shuffle before the write: assignOffsets left the rows range-
      // grouped and sorted by (partition, offset), so each task streams its
      // contiguous offset runs straight into the dynamic-partition writer —
      // a big single-partition batch writes from MANY tasks in parallel
      // (disjoint offset ranges per file keep the index exact), where a
      // `repartition(n, partition)` here would funnel it back into one.
      assigned
        .sortWithinPartitions(col("partition"), col("offset"))
        .write
        .mode("overwrite")
        .option("maxRecordsPerFile", conf.maxRecordsPerFile)
        .option("compression", conf.compression)
        .partitionBy("partition")
        .parquet(staging)
      // a declared-partition append must not have routed anything outside
      // its locked set; reject BEFORE the staged files become visible
      partitions.foreach { _ =>
        val sp = new Path(staging)
        val sfs = sp.getFileSystem(new Configuration())
        val lockedSet = locked.toSet
        // non-numeric dirs (e.g. a null route's __HIVE_DEFAULT_PARTITION__)
        // are strays by definition — never let a parse failure skip cleanup
        val stray = sfs.listStatus(sp).map(_.getPath.getName)
          .filter(_.startsWith("partition="))
          .filterNot(n => scala.util.Try(
            n.substring("partition=".length).toInt).toOption.exists(lockedSet))
        if (stray.nonEmpty) {
          sfs.delete(sp, true)
          throw new IllegalArgumentException(
            s"records routed to ${stray.sorted.mkString(",")} outside " +
              s"the declared partition set ${locked.mkString(",")} — nothing was committed")
        }
      }
      val newFiles = commitStaged(staging, logDir)

      // Index the new files from their parquet FOOTERS (offset column
      // min/max + row count) — no Spark job, no data re-read; files are
      // written offset-sorted so the footer stats are exact. One footer
      // read per new file, parallelized on the driver.
      val stats: Seq[FileStats] = {
        import scala.jdk.CollectionConverters._
        java.util.Arrays.stream(newFiles.toArray).parallel()
          .map[FileStats](f => readFooterStats(f))
          .collect(java.util.stream.Collectors.toList[FileStats]).asScala.toSeq
      }
      val ranges: Map[Int, (Long, Long)] = if (stats.isEmpty) Map.empty else {
        val indexRows = stats.map { s =>
          IndexIO.IndexRow(
            topic, s.partition, s.file, s.baseOffset, s.endOffset,
            s.count, batchId)
        }
        writeIndexDelta(wh, topic, indexRows)
        IndexCache.invalidate(wh, topic)
        // compaction rewrites EVERY partition's index rows, so it may only
        // run while holding every partition lock
        if (locked.size == n) maybeCompactIndex(spark, wh, topic)
        stats.groupBy(_.partition).map { case (p, ss) =>
          p -> (ss.map(_.baseOffset).min, ss.map(_.endOffset).max)
        }
      }
      AppendResult(topic, batchId,
        ranges, stats.map(_.count).sum)
    }
    // a declared-partition append cannot compact inline (it holds only its
    // own locks); once the delta count crosses the bound, escalate to the
    // full topic lock AFTER releasing — index growth stays bounded even for
    // workloads that only ever do explicit-partition appends
    if (locked.size < n && indexNeedsCompaction(wh, topic))
      graft.core.Locks.withTopicLock(wh, topic, n) {
        if (indexNeedsCompaction(wh, topic)) LogIndex.compactIndex(spark, wh, topic)
      }
    result
  }

  /** Convenience produce path for `Dataset[ProducerRecord]`-shaped input. */
  def produce(
      spark: SparkSession,
      wh: Warehouse,
      topic: String,
      records: DataFrame,
      ordCol: String): AppendResult =
    append(spark, wh, topic, records, ordCol)

  private[log] case class FileStats(
      partition: Int, file: String, baseOffset: Long, endOffset: Long, count: Long)

  /** Offset range + row count of one committed file, from its parquet
    * footer column statistics (the `offset` column is LongType and always
    * present, so min/max are exact). Partition id parses from the
    * `partition=<p>` directory. */
  private[log] def footerStats(file: String): FileStats = readFooterStats(file)

  private def readFooterStats(file: String): FileStats = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val path = new Path(file)
    val partition = path.getParent.getName match {
      case s if s.startsWith("partition=") => s.substring("partition=".length).toInt
      case other => throw new IllegalStateException(s"unexpected log layout: $other")
    }
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(path, new Configuration()))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      var lo = Long.MaxValue
      var hi = Long.MinValue
      var n = 0L
      blocks.foreach { b =>
        n += b.getRowCount
        b.getColumns.asScala.find(_.getPath.toDotString == "offset").foreach { c =>
          val st = c.getStatistics
          if (st != null && st.hasNonNullValue) {
            lo = math.min(lo, st.genericGetMin.asInstanceOf[java.lang.Long])
            hi = math.max(hi, st.genericGetMax.asInstanceOf[java.lang.Long])
          }
        }
      }
      FileStats(partition, file, lo, hi, n)
    } finally reader.close()
  }

  /** One index delta file lands per append; past this many the topic's
    * index is rewritten into one file. Each index row is thus rewritten
    * O(appends / MaxIndexFiles) times — bounded listing + reload in exchange
    * for a periodic metadata-scale rewrite (an index row is ~100 bytes per
    * SEGMENT, so even a million-segment topic compacts in one small job). */
  private val MaxIndexFiles = 64

  private def indexNeedsCompaction(wh: Warehouse, topic: String): Boolean = {
    val p = new Path(wh.indexDir(topic))
    val fs = p.getFileSystem(new Configuration())
    fs.exists(p) &&
      fs.listStatus(p).count(s => !s.getPath.getName.startsWith("_")) > MaxIndexFiles
  }

  private def maybeCompactIndex(
      spark: SparkSession, wh: Warehouse, topic: String): Unit =
    if (indexNeedsCompaction(wh, topic)) LogIndex.compactIndex(spark, wh, topic)

  /** Land one append's index delta atomically: write to a private staging
    * dir, then rename the single part-file into the topic's index dir under
    * a unique name. `mode("append")` into a shared dir is NOT safe under
    * concurrency — both jobs stage under `<dir>/_temporary/0` and one
    * committer's cleanup deletes the other's in-flight attempt files (the
    * exact corruption the round-3 concurrent-append failure exposed). With
    * staging private per append, deltas from concurrent disjoint-partition
    * appends land independently. */
  private def writeIndexDelta(
      wh: Warehouse, topic: String, rows: Seq[IndexIO.IndexRow]): Unit = {
    // `=` separators: topic names cannot contain `=`, so vacuum's
    // prefix-match on `.delta=<topic>=` can never claim a DIFFERENT topic's
    // in-flight delta (`.delta-a-...` would be a prefix of `.delta-a-b-...`).
    // The delta is metadata-scale (one row per new file) and is written
    // DRIVER-SIDE (IndexIO) — the old `coalesce(1)` Spark write was one
    // whole driver job of fixed overhead per append; the stage-then-rename
    // crash protocol is unchanged.
    val uid = java.util.UUID.randomUUID().toString.take(12)
    val staging = s"${wh.indexBase}/.delta=$topic=$uid"
    val stagedFile = new Path(staging, s"delta-$uid.parquet")
    val fs = stagedFile.getFileSystem(new Configuration())
    IndexIO.writeFile(stagedFile, rows)
    val dest = new Path(wh.indexDir(topic), s"delta-$uid.parquet")
    fs.mkdirs(dest.getParent)
    if (!fs.rename(stagedFile, dest))
      throw new IllegalStateException(s"failed to land index delta for '$topic'")
    fs.delete(new Path(staging), true)
  }

  /** Move every staged data file into its live `partition=<p>` dir and drop
    * the staging dir; returns the final paths. Spark part-file names embed
    * the write job's UUID, so names cannot collide with earlier appends.
    * Listing here is over the staging dir only. Shared with compaction
    * ([[LogRetention.compact]]), which stages its rewritten segments the
    * same way. */
  private[log] def commitStaged(staging: String, logDir: String): Seq[String] = {
    val sp = new Path(staging)
    val fs = sp.getFileSystem(new Configuration())
    if (!fs.exists(sp)) return Seq.empty
    val pairs = Seq.newBuilder[(Path, Path)]
    val it = fs.listFiles(sp, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      val parent = f.getPath.getParent.getName
      if (!name.startsWith("_") && !name.startsWith(".") &&
          parent.startsWith("partition="))
        pairs += (f.getPath -> new Path(s"$logDir/$parent/$name"))
    }
    val moves = pairs.result()
    // One mkdirs per destination partition dir, then the renames fan out on
    // a parallel stream: on a real DFS each rename is a metadata RPC, and a
    // large batch stages thousands of part-files — paying those RPCs
    // serially inside the locked commit window would make commit latency
    // O(files); the footer reads just after this are already parallel.
    moves.map(_._2.getParent).distinct.foreach(fs.mkdirs)
    java.util.Arrays.stream(moves.toArray).parallel().forEach { m =>
      if (!fs.rename(m._1, m._2))
        throw new IllegalStateException(s"failed to commit staged file ${m._1.getName}")
    }
    fs.delete(sp, true)
    moves.map(_._2.toString).sorted
  }
}
