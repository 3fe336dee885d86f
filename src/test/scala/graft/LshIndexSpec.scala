package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, LshIndex}

class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def corpus = docs.filter($"doc_id" % 4 =!= 0)
  private def batch = docs.filter($"doc_id" % 4 === 0)

  test("probe equals the cross-pair restriction of the batch pipeline") {
    val path = tmpDir("graft-lsh-eq")
    LshIndex.build(corpus, $"doc_id", $"text", path,
      shingleSize = 5, numHashes = 128, bands = 16)
    val probed = LshIndex.probe(spark, path, batch, $"doc_id", $"text",
        threshold = 0.6)
      .select("batch_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    // the one-shot pipeline over the union, restricted to pairs that
    // cross the corpus/batch split — identical hash family, shingling,
    // and verification, so the sets must match exactly
    val full = Dedup.minhashPairs(docs, $"doc_id", $"text",
        shingleSize = 5, numHashes = 128, bands = 16, threshold = 0.6)
      .as[(Long, Long, Double)].collect()
      .collect {
        case (a, b, j) if a % 4 == 0 && b % 4 != 0 => (a, b, j)
        case (a, b, j) if b % 4 == 0 && a % 4 != 0 => (b, a, j)
      }.toSet
    assert(probed.nonEmpty, "testdata must contain cross-split near-dups")
    assert(probed === full)
    // the fused (cache-within-call, local-relation result) probe is the
    // same computation — identical pair set, and no persisted intermediate
    // left behind for downstream actions to hold
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val fused = LshIndex.probeFused(spark, path, batch, $"doc_id", $"text",
        threshold = 0.6)
      .select("batch_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(fused === full)
    assert(spark.sparkContext.getPersistentRDDs.size == cachedBefore,
      "probeFused must unpersist every intermediate before returning")
  }

  test("append extends the index: probe equals a fresh full build") {
    val half1 = corpus.filter($"doc_id" % 2 === 1)
    val half2 = corpus.filter($"doc_id" % 2 === 0)
    val inc = tmpDir("graft-lsh-inc")
    LshIndex.build(half1, $"doc_id", $"text", inc,
      shingleSize = 5, numHashes = 128, bands = 16)
    LshIndex.append(half2, $"doc_id", $"text", inc)
    val fresh = tmpDir("graft-lsh-fresh")
    LshIndex.build(corpus, $"doc_id", $"text", fresh,
      shingleSize = 5, numHashes = 128, bands = 16)
    def run(p: String) =
      LshIndex.probe(spark, p, batch, $"doc_id", $"text", threshold = 0.6)
        .as[(Long, Long, Double)].collect().toSet
    assert(run(inc) === run(fresh))
  }

  test("probe broadcasts the batch side and never rereads corpus text") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val path = tmpDir("graft-lsh-plan")
    LshIndex.build(corpus, $"doc_id", $"text", path,
      shingleSize = 5, numHashes = 128, bands = 16)
    val mem = batch.select($"doc_id", $"text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))).toDF("doc_id", "text")
    val probed = LshIndex.probe(spark, path, mem, $"doc_id", $"text")
    // with the batch fully in memory, every file the probe reads must be
    // an index file — the corpus documents.parquet is never touched
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
      "candidate generation must broadcast the batch's band keys")
  }

  test("probe scans only batch-hit shard directories (partition prune)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val path = tmpDir("graft-lsh-prune")
    LshIndex.build(corpus, $"doc_id", $"text", path,
      shingleSize = 5, numHashes = 128, bands = 16, numShards = 64)
    val totalBucketFiles =
      spark.read.parquet(s"$path/buckets").inputFiles.length
    val totalShingleFiles =
      spark.read.parquet(s"$path/shingles").inputFiles.length
    assert(totalBucketFiles > 16 && totalShingleFiles > 16,
      "need more shard files than a 1-doc batch can hit")
    // a single-document batch emits exactly `bands` band keys, so its
    // bucket-shard hit set is ≤ 16 of the 64 shard directories; the
    // shingle side prunes to the candidates' id shards
    val one = batch.orderBy($"doc_id").limit(1)
      .select($"doc_id", $"text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))).toDF("doc_id", "text")
    val probed = LshIndex.probe(spark, path, one, $"doc_id", $"text",
      threshold = 0.0)
    probed.collect()
    val root = probed.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    val scans = allFileScans(root)
    def scansOf(table: String) = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains(table)))
    val bucketScans = scansOf("buckets")
    val shingleScans = scansOf("shingles")
    assert(bucketScans.nonEmpty && shingleScans.nonEmpty)
    bucketScans.foreach { s =>
      assert(s.toString.contains("PartitionFilters"),
        "shard predicate must land in PartitionFilters")
      val n = s.metrics("numFiles").value
      assert(n <= 16 && n < totalBucketFiles,
        s"1-doc probe must read ≤16 bucket shard files, got $n of $totalBucketFiles")
    }
    shingleScans.foreach { s =>
      val n = s.metrics("numFiles").value
      assert(n < totalShingleFiles,
        s"shingle verify must prune to candidate id shards, got $n of $totalShingleFiles")
    }
  }

  test("replayed append changes neither probe pairs nor the bucket guard") {
    val repeated = (1L to 6L).map(i => (i, "the same exact document text"))
      .toDF("doc_id", "text")
    val probe1 = Seq((100L, "the same exact document text"))
      .toDF("doc_id", "text")
    val path = tmpDir("graft-lsh-replay")
    LshIndex.build(repeated.filter($"doc_id" <= 3), $"doc_id", $"text", path,
      shingleSize = 5, numHashes = 128, bands = 16)
    val tail = repeated.filter($"doc_id" > 3)
    LshIndex.append(tail, $"doc_id", $"text", path)
    // replay the SAME append (crash-after-append recovery): index rows
    // duplicate, ids do not
    LshIndex.append(tail, $"doc_id", $"text", path)
    // maxBucketSize=8: raw row count per bucket is now 9 (> 8) but the
    // distinct-id count stays 6 (≤ 8) — replay must not trip the guard
    val out = LshIndex.probe(spark, path, probe1, $"doc_id", $"text",
        threshold = 0.6, maxBucketSize = 8)
      .as[(Long, Long, Double)].collect()
    assert(out.length === 6, s"one row per cross pair under replay, got ${out.length}")
    assert(out.toSet.size === 6, "verify side must dedupe replayed shingle rows")
    assert(out.forall(_._3 === 1.0))
  }

  test("degenerate corpus buckets are dropped by maxBucketSize") {
    val repeated = (1L to 6L).map(i => (i, "the same exact document text"))
      .toDF("doc_id", "text")
    val probe1 = Seq((100L, "the same exact document text"))
      .toDF("doc_id", "text")
    val path = tmpDir("graft-lsh-guard")
    LshIndex.build(repeated, $"doc_id", $"text", path,
      shingleSize = 5, numHashes = 128, bands = 16)
    val guarded = LshIndex.probe(spark, path, probe1, $"doc_id", $"text",
      threshold = 0.6, maxBucketSize = 3)
    assert(guarded.count() === 0L,
      "every bucket holds all 6 corpus docs > maxBucketSize=3 → no candidates")
    val open = LshIndex.probe(spark, path, probe1, $"doc_id", $"text",
      threshold = 0.6, maxBucketSize = 10)
    assert(open.count() === 6L)
    assert(open.select(max($"jaccard")).head.getDouble(0) === 1.0)
  }
}
