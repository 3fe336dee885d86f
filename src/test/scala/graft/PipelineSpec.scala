package graft

import graft.core.ProducerConfig
import graft.core.catalog.{TopicCatalog, Warehouse}
import graft.core.log.{LogReader, LogWriter}
import graft.pipeline.{Multimodal, Skew}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("compression: every codec round-trips through the log (C1)") {
    // reference CompressionType: none/gzip/snappy/lz4/zstd — here the codec
    // is a storage property of the parquet segments
    Seq("none", "gzip", "snappy", "lz4", "zstd").foreach { codec =>
      val wh = Warehouse(tmpDir(s"graft-codec-$codec"))
      TopicCatalog.createTopic(spark, wh, "t", 2)
      val recs = (0 until 100).map(i => (i.toLong, 1L, s"k$i", s"value-$i-" + ("x" * 50)))
        .toDF("id", "ts", "key", "value")
      LogWriter.append(spark, wh, "t", recs, "id",
        conf = ProducerConfig(compression = codec))
      val back = LogReader.scan(spark, wh, "t")
      assert(back.count() === 100, codec)
      val sample = back.filter($"key" === "k7").select("value").head().getString(0)
      assert(sample === "value-7-" + ("x" * 50), codec)
    }
  }

  test("multimodal: meta plumbing + stub decode are deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val withBin = Multimodal.withMeta(docs, $"text".cast("binary"), "text/plain")
    val metas = withBin.select($"meta.n_bytes", length($"text").cast("long")).collect()
    // ascii-only docs: n_bytes == n_chars; multibyte docs: n_bytes > n_chars
    metas.foreach(r => assert(r.getLong(0) >= r.getLong(1)))

    val a = withBin.select($"doc_id", Multimodal.decodeStub($"content").as("d")).collect()
    val b = withBin.select($"doc_id", Multimodal.decodeStub($"content").as("d")).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("multimodal: mapPartitions decode preserves rows and is deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("content", $"text".cast("binary"))
    val out = Multimodal.decodePartitions(docs, $"doc_id", $"content", featureDim = 4)
    assert(out.count() === docs.count())
    val row = out.filter(_.id == 7L).head()
    assert(row.features.length === 4)
    assert(row.width >= 1 && row.width <= 1920 && row.height >= 1 && row.height <= 1080)
    val again = Multimodal.decodePartitions(docs, $"doc_id", $"content", featureDim = 4)
      .filter(_.id == 7L).head()
    assert(row.features.toSeq === again.features.toSeq)
  }

  test("salted join equals plain join") {
    val left = (0 until 1000).map(i => (i % 7, s"l$i")).toDF("k", "lv")
    val right = (0 until 7).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(left, right, "k", salts = 4)
      .select("k", "lv", "rv").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("salted aggregation equals plain aggregation") {
    val df = (0 until 10000).map(i => (i % 3, 1L)).toDF("k", "v")
    val plain = df.groupBy($"k").agg(sum($"v").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedAgg(df, $"k", salts = 8,
        partial = Seq(sum($"v").as("ps")),
        combine = Seq(sum($"ps").as("s")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
