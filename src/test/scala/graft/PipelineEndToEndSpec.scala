package graft

import org.apache.spark.sql.functions._
import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.log.{LogReader, LogWriter}
import graft.pipeline.{LshIndex, TrainShards}
import graft.streaming.Curation
import graft.tools.CurateCrash

/** The WHOLE training-data story in one test: raw crawl topic →
  * composed streaming curation (gopher → chunk → incremental LSH dedup)
  * → curated topic → deterministic training shards
  * ([[TrainShards.emitFromTopic]]) — every stage a proven component,
  * this spec pins the end-to-end composition and its determinism. */
class PipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("raw topic -> curation -> training shards, deterministic end to end") {
    val wh = Warehouse(tmpDir("e2e-wh"))
    TopicCatalog.createTopic(spark, wh, "docs", 1)
    TopicCatalog.createTopic(spark, wh, "curated", 2)
    val index = s"${tmpDir("e2e-idx")}/lsh"
    LshIndex.build(
      Seq((999999999999L, "seed sentinel text unrelated to every document"))
        .toDF("doc_id", "text"),
      $"doc_id", $"text", index, shingleSize = 5, numHashes = 128, bands = 16)
    // 12 distinct docs + 3 exact dups + 2 gopher rejects
    val uniq = (0 until 12).map { i =>
      Seq.tabulate(20)(j => s"tok${i}x$j").mkString(" ")
    }
    val bodies = uniq ++ Seq(uniq(0), uniq(3), uniq(7), "too short", "x")
    val records = bodies.zipWithIndex.map { case (text, i) =>
      (i.toLong, 1700000000000L + i, s"doc-$i", text)
    }.toDF("id", "ts", "key", "value")
      .withColumn("explicit_partition", lit(0))
    LogWriter.append(spark, wh, "docs", records, "id")

    Curation.runAvailableNow(spark, wh, "docs", "curated", index,
        tmpDir("e2e-ckpt"), CurateCrash.TestConfig)
      .awaitTermination()

    val curated = LogReader.scan(spark, wh, "curated").count()
    // each 20-token doc chunks to 2 at 16/4; dups and rejects contribute 0
    assert(curated === 24L, "12 unique docs x 2 chunks each")

    val out1 = tmpDir("e2e-shards1")
    val out2 = tmpDir("e2e-shards2")
    val n1 = TrainShards.emitFromTopic(spark, wh, "curated", out1,
      budget = 24, numShards = 2, seed = 11L)
    val n2 = TrainShards.emitFromTopic(spark, wh, "curated", out2,
      budget = 24, numShards = 2, seed = 11L)
    assert(n1 === n2 && n1 > 0)
    def readAll(d: String) = spark.read.parquet(d)
      .select("shard", "seq_id", "n_docs", "seq_tokens", "seq_text")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(readAll(out1) === readAll(out2),
      "re-emission from the same curated topic is byte-deterministic")
    // every curated chunk lands in exactly one training sequence
    assert(spark.read.parquet(out1).agg(sum("n_docs")).head().getLong(0)
      === curated)
  }
}
