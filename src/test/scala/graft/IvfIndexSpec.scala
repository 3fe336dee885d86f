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
}
