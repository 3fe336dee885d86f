package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{IvfIndex, Similarity}

class IvfIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private def corpus = emb
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("persisted index returns exactly the in-memory IVF results") {
    val path = tmpDir("graft-ivf-eq")
    IvfIndex.build(corpus, col("id"), col("vec"), path, nCells = 8)
    val fromIndex = IvfIndex.topK(spark, path, queries, k = 5, nProbe = 3)
      .orderBy("qid", "rank").collect().toSeq
    val inMemory = Similarity
      .ivfTopK(queries, corpus, k = 5, nCells = 8, nProbe = 3)
      .orderBy("qid", "rank").collect().toSeq
    assert(fromIndex.nonEmpty)
    // same deterministic sample, Lloyd iterations, and tie-breaks → the
    // persisted path inherits the in-memory path's recall bounds verbatim
    assert(fromIndex === inMemory)
  }

  test("probing reads only the probed cells' files (partition prune)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // Dataset.inputFiles lists the relation's files BEFORE partition
    // pruning; the proof is the executed scan's numFiles metric.
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val root = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case o => o
      }
      val scan = root.collect { case s: FileSourceScanExec => s }.head
      scan.metrics("numFiles").value
    }
    val path = tmpDir("graft-ivf-prune")
    IvfIndex.build(corpus, col("id"), col("vec"), path, nCells = 8)
    val all = spark.read.parquet(s"$path/cells")
    val nonEmptyCells = all.select("cell").distinct().count()
    assert(nonEmptyCells > 2, "need multiple cells for the prune to mean anything")
    val totalFiles = scannedFiles(spark.read.parquet(s"$path/cells"))
    val two = all.select("cell").distinct().orderBy("cell")
      .limit(2).collect().map(_.getInt(0)).toSeq
    val pruned = IvfIndex.prunedCells(spark, path, two)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"),
      "cell predicate must land in PartitionFilters, not a data filter")
    val prunedFiles = scannedFiles(pruned)
    assert(prunedFiles === 2L,
      s"2-of-$nonEmptyCells-cell probe must read 2 files, got $prunedFiles of $totalFiles")
    assert(totalFiles === nonEmptyCells)
  }

  test("index build writes one file per non-empty cell (repartition before partitionBy)") {
    val path = tmpDir("graft-ivf-files")
    IvfIndex.build(corpus, col("id"), col("vec"), path, nCells = 8)
    val all = spark.read.parquet(s"$path/cells")
    val nonEmptyCells = all.select("cell").distinct().count()
    assert(all.inputFiles.length === nonEmptyCells,
      "cell-clustered layout: exactly one parquet file per cell")
  }

  test("build+append equals fresh build: same assignments, same probe results") {
    // the build sample is orderBy(id).limit(sampleSize); keeping the
    // sample inside the build subset makes the two indexes train
    // IDENTICAL centroids, so build(A)+append(B) must equal build(A∪B)
    // row-for-row — assignment against fixed centroids is batch-oblivious
    val a = corpus.filter(col("id") < 300)
    val b = corpus.filter(col("id") >= 300)
    val incr = tmpDir("graft-ivf-incr")
    val fresh = tmpDir("graft-ivf-fresh")
    IvfIndex.build(a, col("id"), col("vec"), incr, nCells = 8, sampleSize = 200)
    val stats = IvfIndex.append(b, col("id"), col("vec"), incr)
    IvfIndex.build(corpus, col("id"), col("vec"), fresh, nCells = 8, sampleSize = 200)
    // delta-aware read: appended rows live in the cells_delta tail until
    // compact() folds them into the cell directories
    val cellsOf = (p: String) => graft.pipeline.IndexMaintenance
      .readAllWithDelta(spark, s"$p/cells")
      .select("id", "cell").orderBy("id").collect().toSeq
    assert(stats.nAppended === b.count())
    assert(cellsOf(incr) === cellsOf(fresh),
      "appended vectors land in exactly the cells a fresh build assigns")
    val topOf = (p: String) => IvfIndex.topK(spark, p, queries, k = 5, nProbe = 3)
      .orderBy("qid", "rank").collect().toSeq
    assert(topOf(incr) === topOf(fresh))
  }

  test("append stamps a drift metric against the build-time mean cosine") {
    val path = tmpDir("graft-ivf-drift")
    IvfIndex.build(corpus, col("id"), col("vec"), path, nCells = 8,
      sampleSize = 200)
    // same-distribution batch: drift should be small and the means sane
    val stats = IvfIndex.append(
      corpus.filter(col("id") >= 450).withColumn("id", col("id") + 1000),
      col("id"), col("vec"), path)
    assert(stats.nAppended === 50)
    assert(stats.buildMeanCosine > 0.0 && stats.buildMeanCosine <= 1.0)
    assert(stats.batchMeanCosine > 0.0 && stats.batchMeanCosine <= 1.0)
    assert(math.abs(stats.drift) < 0.5,
      s"same-distribution append must not report catastrophic drift: $stats")
    // metric direction: a batch of the centroid vectors themselves fits
    // perfectly (self-cosine 1), so its drift must be negative
    val perfect = IvfIndex.append(
      spark.read.parquet(s"$path/centroids")
        .select((col("cell") + 9000).cast("long").as("id"),
          col("cvec").as("vec")),
      col("id"), col("vec"), path)
    assert(perfect.batchMeanCosine > 0.999,
      s"centroids assigned to themselves: $perfect")
    assert(perfect.drift < 0,
      s"a perfectly-fitting batch must report negative drift: $perfect")
  }
}
