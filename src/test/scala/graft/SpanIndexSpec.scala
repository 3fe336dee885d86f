package graft

import graft.pipeline.SpanIndex
import org.apache.spark.sql.functions._

class SpanIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b c d e x y"),
    (2L, "p q r s t u")
  ).toDF("doc_id", "text")

  test("probe cuts corpus-seen spans and batch-internal repeats, keeps fresh text") {
    val path = tmpDir("graft-span-probe")
    SpanIndex.build(corpus, $"doc_id", $"text", path, k = 3)
    val batch = Seq(
      (100L, "m a b c d e n"),      // corpus 3-grams cover positions 1-5
      (101L, "f g h i j"),          // fresh → untouched
      (102L, "u v w z z z u v w")   // "u v w" twice within the batch doc
    ).toDF("doc_id", "text")
    val out = SpanIndex.probe(spark, path, batch, $"doc_id", $"text")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(100L) === ((100L, 7, 5, "m n")))
    assert(out(101L) === ((101L, 5, 0, "f g h i j")))
    assert(out(102L) === ((102L, 9, 6, "z z z")))
  }

  test("ingestBatch replay re-derives the identical output; steady state cuts repeats") {
    val path = tmpDir("graft-span-replay")
    SpanIndex.build(corpus, $"doc_id", $"text", path, k = 3)
    val b1 = Seq(
      (10L, "h i j k l"),
      (11L, "a b c d z")            // "a b c"/"b c d" from corpus → cut
    ).toDF("doc_id", "text")
    val out1 = SpanIndex.ingestBatch(spark, path, b1, $"doc_id", $"text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(out1.find(_._1 == 11L).get._4 === "z")
    // crash-after-append replay: grams of b1 are already in the index,
    // but the owner guard keeps each doc from matching itself
    val out2 = SpanIndex.ingestBatch(spark, path, b1, $"doc_id", $"text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(out1 === out2)
    // a later batch repeating b1's kept content gets cut against it
    val b2 = Seq((20L, "o h i j k l o")).toDF("doc_id", "text")
    val o2 = SpanIndex.probe(spark, path, b2, $"doc_id", $"text")
      .as[(Long, Int, Int, String)].collect().head
    assert(o2 === ((20L, 7, 5, "o o")))
  }

  test("probe scans only batch-hit gram shard directories (partition prune)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = tmpDir("graft-span-prune")
    SpanIndex.build(docs, $"doc_id", $"text", path, k = 5)
    val totalFiles = spark.read.parquet(s"$path/grams").inputFiles.length
    assert(totalFiles > 8, "need more shard files than a tiny batch can hit")
    // a 6-word batch doc has exactly 2 five-grams → hits ≤ 2 of 64 shards;
    // words come from a real corpus doc so the gram join is non-empty and
    // AQE cannot empty-propagate the pruned scan out of the plan
    val words = docs.orderBy($"doc_id").limit(1)
      .select($"text").as[String].head().trim.split("\\s+").take(6)
    val one = Seq((900000L, words.mkString(" "))).toDF("doc_id", "text")
    val probed = SpanIndex.probe(spark, path, one, $"doc_id", $"text")
    probed.collect()
    val root = probed.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case o => o
    }
    val gramScans = allFileScans(root).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("grams")))
    assert(gramScans.nonEmpty)
    gramScans.foreach { s =>
      assert(s.toString.contains("PartitionFilters"),
        "shard predicate must land in PartitionFilters")
      val n = s.metrics("numFiles").value
      assert(n <= 2 && n < totalFiles,
        s"2-gram probe must read <=2 gram shard files, got $n of $totalFiles")
    }
  }

  test("compact collapses appended files; probe results unchanged") {
    val path = tmpDir("graft-span-compact")
    SpanIndex.build(corpus, $"doc_id", $"text", path, k = 3)
    val extra = Seq((5L, "n o p q r")).toDF("doc_id", "text")
    SpanIndex.append(extra, $"doc_id", $"text", path)
    SpanIndex.append(extra, $"doc_id", $"text", path) // replayed append
    val batch = Seq((30L, "x n o p q r y a b c d x")).toDF("doc_id", "text")
    val before = SpanIndex.probe(spark, path, batch, $"doc_id", $"text")
      .as[(Long, Int, Int, String)].collect().toSeq
    val stats = SpanIndex.compact(spark, path)
    assert(stats.dirsCompacted > 0 && stats.filesRemoved > 0)
    val after = SpanIndex.probe(spark, path, batch, $"doc_id", $"text")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(before === after)
    // every compacted shard directory is down to one data file
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.conf.Configuration())
    val rootP = new org.apache.hadoop.fs.Path(s"$path/grams")
    fs.listStatus(rootP).filter(_.isDirectory).foreach { d =>
      val files = fs.listStatus(d.getPath)
        .filter(f => !f.isDirectory)
        .map(_.getPath.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
      assert(files.length === 1, s"${d.getPath.getName}: ${files.toSeq}")
    }
  }

  test("empty batch probes to an empty frame without touching the index") {
    val path = tmpDir("graft-span-empty")
    SpanIndex.build(corpus, $"doc_id", $"text", path, k = 3)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SpanIndex.probe(spark, path, empty, $"doc_id", $"text").count() === 0L)
  }
}
