package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, SrpIndex}

class SrpIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def corpus = emb.filter($"vec_id" % 4 =!= 0)
  private def batch = emb.filter($"vec_id" % 4 === 0)

  test("probe equals the cross-pair restriction of the batch pipeline") {
    val path = tmpDir("graft-srp-eq")
    SrpIndex.build(corpus, $"vec_id", $"embedding", path, nBits = 4)
    val probed = SrpIndex.probe(spark, path, batch, $"vec_id", $"embedding",
        threshold = 0.35)
      .select("batch_id", "corpus_id", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    // identical planes, bucketing, and cosine — the one-shot pipeline over
    // the union, restricted to cross-split pairs, must match exactly
    val full = Dedup.embeddingNearDupPairs(emb, $"vec_id", $"embedding",
        threshold = 0.35, nBits = 4)
      .as[(Long, Long, Double)].collect()
      .collect {
        case (a, b, c) if a % 4 == 0 && b % 4 != 0 => (a, b, c)
        case (a, b, c) if b % 4 == 0 && a % 4 != 0 => (b, a, c)
      }.toSet
    assert(probed.nonEmpty, "testdata must contain cross-split near-dups")
    assert(probed === full)
  }

  test("append extends the index: probe equals a fresh full build") {
    val inc = tmpDir("graft-srp-inc")
    SrpIndex.build(corpus.filter($"vec_id" % 2 === 1),
      $"vec_id", $"embedding", inc, nBits = 4)
    SrpIndex.append(corpus.filter($"vec_id" % 2 === 0),
      $"vec_id", $"embedding", inc)
    val fresh = tmpDir("graft-srp-fresh")
    SrpIndex.build(corpus, $"vec_id", $"embedding", fresh, nBits = 4)
    def run(p: String) =
      SrpIndex.probe(spark, p, batch, $"vec_id", $"embedding", threshold = 0.35)
        .as[(Long, Long, Double)].collect().toSet
    assert(run(inc) === run(fresh))
  }

  test("probe broadcasts the batch side and never rereads corpus vectors") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val path = tmpDir("graft-srp-plan")
    SrpIndex.build(corpus, $"vec_id", $"embedding", path, nBits = 4)
    val mem = batch.select($"vec_id", $"embedding").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .toDF("vec_id", "embedding")
    val probed = SrpIndex.probe(spark, path, mem, $"vec_id", $"embedding",
      threshold = 0.35)
    assert(probed.inputFiles.nonEmpty)
    assert(probed.inputFiles.forall(_.contains(path)),
      s"probe must read only the index, got ${probed.inputFiles.toSeq}")
    probed.collect()
    val plan = probed.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    assert(plan.toString.contains("BroadcastHashJoin") ||
      plan.collectWithSubqueries { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "candidate generation must broadcast the batch's buckets")
  }

  test("probe scans only batch-hit bucket directories (partition prune)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val path = tmpDir("graft-srp-prune")
    SrpIndex.build(corpus, $"vec_id", $"embedding", path, nBits = 4,
      numShards = 64)
    val totalBucketFiles =
      spark.read.parquet(s"$path/buckets").inputFiles.length
    val totalVectorFiles =
      spark.read.parquet(s"$path/vectors").inputFiles.length
    assert(totalBucketFiles > 2 && totalVectorFiles > 2,
      "need more files than a 1-vector batch can hit")
    // a single-vector batch hashes to exactly ONE srp bucket, so the
    // bucket scan must open exactly one bucket directory; the vector
    // side prunes to the candidates' id shards
    val one = batch.orderBy($"vec_id").limit(1)
      .select($"vec_id", $"embedding").collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toDF("vec_id", "embedding")
    val probed = SrpIndex.probe(spark, path, one, $"vec_id", $"embedding",
      threshold = -1.0)
    probed.collect()
    val root = probed.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    val scans = allFileScans(root)
    def scansOf(table: String) = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains(table)))
    val bucketScans = scansOf("buckets")
    val vectorScans = scansOf("vectors")
    assert(bucketScans.nonEmpty && vectorScans.nonEmpty)
    bucketScans.foreach { s =>
      assert(s.toString.contains("PartitionFilters"),
        "bucket predicate must land in PartitionFilters")
      val n = s.metrics("numFiles").value
      assert(n === 1L,
        s"1-vector probe hits one srp bucket → one file, got $n of $totalBucketFiles")
    }
    vectorScans.foreach { s =>
      val n = s.metrics("numFiles").value
      assert(n < totalVectorFiles,
        s"cosine verify must prune to candidate id shards, got $n of $totalVectorFiles")
    }
  }

  test("replayed append changes neither probe pairs nor the bucket guard") {
    val v = (0 until 64).map(_.toFloat)
    val repeated = (1L to 6L).map(i => (i, v)).toDF("vec_id", "embedding")
    val probe1 = Seq((100L, v)).toDF("vec_id", "embedding")
    val path = tmpDir("graft-srp-replay")
    SrpIndex.build(repeated.filter($"vec_id" <= 3), $"vec_id", $"embedding",
      path, nBits = 4)
    val tail = repeated.filter($"vec_id" > 3)
    SrpIndex.append(tail, $"vec_id", $"embedding", path)
    // replay the SAME append: rows duplicate, ids do not
    SrpIndex.append(tail, $"vec_id", $"embedding", path)
    // maxBucketSize=8: raw rows per bucket now 9 (> 8), distinct ids 6
    val out = SrpIndex.probe(spark, path, probe1, $"vec_id", $"embedding",
        threshold = 0.35, maxBucketSize = 8)
      .as[(Long, Long, Double)].collect()
    assert(out.length === 6, s"one row per cross pair under replay, got ${out.length}")
    assert(out.toSet.size === 6, "verify side must dedupe replayed vector rows")
    assert(out.forall(_._3 === 1.0))
  }

  test("degenerate corpus buckets are dropped by maxBucketSize") {
    val v = (0 until 64).map(_.toFloat)
    val repeated = (1L to 6L).map(i => (i, v)).toDF("vec_id", "embedding")
    val probe1 = Seq((100L, v)).toDF("vec_id", "embedding")
    val path = tmpDir("graft-srp-guard")
    SrpIndex.build(repeated, $"vec_id", $"embedding", path, nBits = 4)
    val guarded = SrpIndex.probe(spark, path, probe1, $"vec_id", $"embedding",
      threshold = 0.35, maxBucketSize = 3)
    assert(guarded.count() === 0L,
      "the shared bucket holds all 6 corpus vecs > maxBucketSize=3")
    val open = SrpIndex.probe(spark, path, probe1, $"vec_id", $"embedding",
      threshold = 0.35, maxBucketSize = 10)
    assert(open.count() === 6L)
    assert(open.select(max($"cosine")).head.getDouble(0) === 1.0)
  }
}
