package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{IvfPq, IvfPqIndex}

/** Persisted IVF-PQ index ([[graft.pipeline.IvfPqIndex]]): identical
  * ranking to the one-shot path, model round-trip, the
  * partition-directory prune, and append-without-refit visibility. */
class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val path = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-spec").toString
    IvfPqIndex.build(emb, col("vec_id"), col("embedding"), root,
      dim = 64, nCells = 16, m = 8, ksub = 16, iters = 2)
    root
  }

  test("stored model round-trips bit-identically") {
    val direct = IvfPq.fit(emb, col("vec_id"), col("embedding"),
      dim = 64, nCells = 16, m = 8, ksub = 16, iters = 2)
    val stored = IvfPqIndex.readModel(spark, path)
    assert(stored.coarse === direct.coarse)
    assert(stored.pq.centroids === direct.pq.centroids)
    assert((stored.dim, stored.nCells, stored.pq.m, stored.pq.ksub) ===
      (direct.dim, direct.nCells, direct.pq.m, direct.pq.ksub))
  }

  test("persisted topK equals the one-shot IvfPq.adcTopK exactly") {
    val model = IvfPqIndex.readModel(spark, path)
    val queries = emb.filter(col("vec_id") < 8)
    val oneShot = IvfPq.adcTopK(queries, col("vec_id"), col("embedding"),
        IvfPq.encode(emb, col("vec_id"), col("embedding"), model),
        model, nProbe = 4, k = 5)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val persisted = IvfPqIndex.topK(spark, path, queries,
        col("vec_id"), col("embedding"), k = 5, nProbe = 4)
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(persisted.toSeq === oneShot.toSeq)
  }

  test("probe scans only the probed cells' files (directory prune)") {
    val model = IvfPqIndex.readModel(spark, path)
    val q = emb.filter(col("vec_id") === 3L)
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double"), 6)))
      .as[(Long, Seq[Double])].head()
    val probed = model.coarse.zipWithIndex.map { case (c, cid) =>
      (q._2.zip(c).map { case (x, y) => val d = x - y; d * d }.sum, cid)
    }.sortBy { case (d, cid) => (d, cid) }.take(4).map(_._2)
    // Dataset.inputFiles lists the relation's files BEFORE partition
    // pruning; the proof is the executed scan's numFiles metric (the
    // IvfIndexSpec convention)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val pruned = IvfPqIndex.prunedCodes(spark, path, probed)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"),
      "cell predicate must land in PartitionFilters, not a data filter")
    pruned.collect()
    val root = pruned.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    val scan = root.collect { case s: FileSourceScanExec => s }.head
    val prunedFiles = scan.metrics("numFiles").value
    val allFiles = spark.read.parquet(s"$path/codes").inputFiles.length
    assert(prunedFiles == probed.size.toLong && prunedFiles < allFiles,
      s"4-of-16-cell probe must read 4 files, got $prunedFiles of $allFiles")
  }

  test("re-build refreshes the cached model (no stale serve after drift rebuild)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-rebuild").toString
    IvfPqIndex.build(emb.filter(col("vec_id") < 300),
      col("vec_id"), col("embedding"), root,
      dim = 64, nCells = 8, m = 8, ksub = 16, iters = 2)
    val first = IvfPqIndex.readModel(spark, root)
    IvfPqIndex.build(emb, col("vec_id"), col("embedding"), root,
      dim = 64, nCells = 8, m = 8, ksub = 16, iters = 2)
    val second = IvfPqIndex.readModel(spark, root)
    assert(second.coarse !== first.coarse,
      "rebuild on the full corpus must produce (and serve) new centroids")
  }

  test("append encodes against the stored model and is immediately probed") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-app").toString
    IvfPqIndex.build(emb.filter(col("vec_id") < 400),
      col("vec_id"), col("embedding"), root,
      dim = 64, nCells = 16, m = 8, ksub = 16, iters = 2)
    val n = IvfPqIndex.append(emb.filter(col("vec_id") >= 400),
      col("vec_id"), col("embedding"), root)
    assert(n === 100)
    // a late vector's exact duplicate would rank itself first; here just
    // assert appended ids are reachable through the probe
    val got = IvfPqIndex.topK(spark, root, emb.filter(col("vec_id") < 20),
        col("vec_id"), col("embedding"), k = 400, nProbe = 16)
      .as[(Long, Long, Int)].collect()
    assert(got.exists(_._2 >= 400), "appended ids must be probe-visible")
  }
}
