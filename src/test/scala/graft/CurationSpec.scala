package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.log.{LogReader, LogWriter}
import graft.pipeline.LshIndex
import graft.streaming.Curation
import graft.tools.CurateCrash

/** Same-JVM behavior of the composed curation pipeline
  * ([[graft.streaming.Curation]]): multi-batch drains share index state
  * through the checkpoint protocol, scheduled in-body compaction keeps the
  * index at one file per shard without changing verdicts, and the
  * CONTINUOUS (processing-time trigger) form curates arriving data. The
  * cross-JVM exactly-once story is [[CurateCrashSpec]]. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val textA =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
  private val textE =
    "apple banana cherry durian elder figs grape honey icecream jackfruit " +
      "kiwi lemon mango nectar orange peach quince raspberry strawberry tomato"

  private def records(rows: (Long, String)*) =
    rows.toDF("ts", "value")
      .withColumn("key", concat(lit("doc-"), col("ts")))
      .withColumn("explicit_partition", lit(0))
      .withColumn("id", col("ts"))

  private def filesPerDir(table: String): Map[String, Int] = {
    val root = new Path(table)
    val fs = root.getFileSystem(new Configuration())
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { d =>
        d.getPath.getName -> fs.listStatus(d.getPath).count { f =>
          val n = f.getPath.getName
          !f.isDirectory && !n.startsWith("_") && !n.startsWith(".")
        }
      }.toMap
  }

  private def setup(tag: String): (Warehouse, String, String) = {
    val wh = Warehouse(tmpDir(s"graft-cur-$tag"))
    TopicCatalog.createTopic(spark, wh, "docs", 1)
    TopicCatalog.createTopic(spark, wh, "curated", 2)
    val index = s"${tmpDir(s"graft-cur-$tag-idx")}/lsh"
    LshIndex.build(
      // sentinel id OUTSIDE the packed chunk-uid space: ids must be
      // unique per index — id 0 would collide with chunkUid(0, 0) = 0
      Seq((999999999999L, "seed sentinel text unrelated to every real document body"))
        .toDF("doc_id", "text"),
      $"doc_id", $"text", index,
      shingleSize = 5, numHashes = 128, bands = 16)
    (wh, index, tmpDir(s"graft-cur-$tag-ckpt"))
  }

  private def curatedKeys(wh: Warehouse): Map[String, Long] =
    LogReader.scan(spark, wh, "curated")
      .groupBy("key").count().as[(String, Long)].collect().toMap

  test("multi-batch drains: cross-batch dedup via index state, per-batch compaction to one file per shard") {
    val (wh, index, ckpt) = setup("drain")
    val cfg = CurateCrash.TestConfig.copy(compactEvery = 1)
    LogWriter.append(spark, wh, "docs",
      records(0L -> textA, 1L -> textA, 2L -> "too short"), "id")
    Curation.runAvailableNow(spark, wh, "docs", "curated", index, ckpt, cfg)
      .awaitTermination()
    assert(curatedKeys(wh) === Map("0/0" -> 1L, "0/1" -> 1L))
    LogWriter.append(spark, wh, "docs",
      records(3L -> textA, 4L -> textE), "id")
    Curation.runAvailableNow(spark, wh, "docs", "curated", index, ckpt, cfg)
      .awaitTermination()
    assert(curatedKeys(wh) ===
      Map("0/0" -> 1L, "0/1" -> 1L, "4/0" -> 1L, "4/1" -> 1L),
      "cross-batch dup dropped by the index; novel doc curated exactly once")
    assert(filesPerDir(s"$index/buckets").values.forall(_ == 1),
      "per-batch compaction must hold the bucket table at one file per shard")
    assert(filesPerDir(s"$index/shingles").values.forall(_ == 1))
  }

  test("a batch where everything fails curation flows through as a clean no-op") {
    val (wh, index, ckpt) = setup("empty")
    val cfg = CurateCrash.TestConfig.copy(compactEvery = 1)
    // every doc fails the gopher floor: the whole downstream (chunk,
    // probe, within-batch dedup, index append, curated append) must
    // handle an EMPTY frame without error and commit the batch
    LogWriter.append(spark, wh, "docs",
      records(0L -> "x", 1L -> "1 2 3", 2L -> ""), "id")
    Curation.runAvailableNow(spark, wh, "docs", "curated", index, ckpt, cfg)
      .awaitTermination()
    assert(curatedKeys(wh) === Map.empty[String, Long])
    // the empty batch COMMITTED: a later drain sees only new records,
    // and curation still works end to end afterwards
    LogWriter.append(spark, wh, "docs", records(3L -> textA), "id")
    Curation.runAvailableNow(spark, wh, "docs", "curated", index, ckpt, cfg)
      .awaitTermination()
    assert(curatedKeys(wh) === Map("3/0" -> 1L, "3/1" -> 1L))
  }

  test("extraFilter composes model-driven selection into the stream (DSIR cut)") {
    import graft.pipeline.Dsir
    val (wh, index, ckpt) = setup("dsir")
    // fit a DSIR model whose target is textA's vocabulary
    val fitDf = Seq((0L, textA, true), (1L, textE, false))
      .toDF("id", "text", "is_target")
    val model = Dsir.fit(fitDf, col("text"), col("is_target"), nBuckets = 256)
    val cfg = CurateCrash.TestConfig.copy(compactEvery = 1,
      extraFilter = Some(Dsir.logWeight(model, col("text")) > lit(0.0)))
    LogWriter.append(spark, wh, "docs",
      records(0L -> textA, 1L -> textE), "id")
    Curation.runAvailableNow(spark, wh, "docs", "curated", index, ckpt, cfg)
      .awaitTermination()
    // target-vocab doc curated; background-vocab doc cut by the model
    assert(curatedKeys(wh) === Map("0/0" -> 1L, "0/1" -> 1L),
      "DSIR threshold keeps the target-like doc and cuts the other")
    // pure per-row predicate ⇒ a second drain of identical appended docs
    // dedups against the index rather than re-admitting anything
    LogWriter.append(spark, wh, "docs", records(2L -> textA), "id")
    Curation.runAvailableNow(spark, wh, "docs", "curated", index, ckpt, cfg)
      .awaitTermination()
    assert(curatedKeys(wh) === Map("0/0" -> 1L, "0/1" -> 1L))
  }

  test("gopherPasses == gopherSignals.passes on the corpus (verdict-only fusion)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaSignals = graft.pipeline.Quality
      .gopherSignals(docs, $"doc_id", $"text", minTokens = 30, maxTokens = 90)
      .select($"id", $"passes").as[(Long, Boolean)].collect().toMap
    val viaPredicate = docs.select($"doc_id",
        graft.pipeline.Quality.gopherPasses($"text",
          minTokens = 30, maxTokens = 90).as("p"))
      .as[(Long, Boolean)].collect().toMap
    assert(viaPredicate === viaSignals)
    assert(viaPredicate.values.exists(identity) &&
      viaPredicate.values.exists(!_), "corpus must exercise both verdicts")
  }

  test("curation front half (gopher filter + chunk explode) runs shuffle-free on the scan") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = docs
      .select($"doc_id".as("id"), $"text")
      .filter(graft.pipeline.Quality.gopherPasses($"text",
        minTokens = 30, maxTokens = 90))
    val front = graft.pipeline.Chunking.chunkTokens(
      chunks, $"id", $"text", chunkSize = 64, overlap = 16)
    front.write.format("noop").mode("overwrite").save()
    val plan = front.queryExecution.executedPlan
    assert(plan.collectWithSubqueries { case e: Exchange => e }.isEmpty,
      s"filter + chunk must be row-local on the scan, got:\n$plan")
  }

  test("continuous form: a processing-time query curates arriving records") {
    val (wh, index, ckpt) = setup("cont")
    LogWriter.append(spark, wh, "docs",
      records(0L -> textA, 1L -> textE), "id")
    val q = Curation.start(spark, wh, "docs", "curated", index, ckpt,
      CurateCrash.TestConfig, triggerMs = 200)
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def keys() = curatedKeys(wh)
      while (keys().size < 4 && System.nanoTime() < deadline)
        Thread.sleep(250)
      assert(keys() ===
        Map("0/0" -> 1L, "0/1" -> 1L, "1/0" -> 1L, "1/1" -> 1L))
    } finally q.stop()
  }
}
