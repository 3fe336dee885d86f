package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import graft.pipeline.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodePartitions reads true dimensions + pixel luminance from real PNGs") {
    val df = Seq(
      (1L, png(123, 45, 0xffffff)), // white
      (2L, png(64, 64, 0x000000)), // black
      (3L, "definitely not an image payload".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val out = Multimodal.decodePartitions(df, $"doc_id", $"content", featureDim = 4)
      .collect().map(d => d.id -> d).toMap
    assert(out(1L).width === 123)
    assert(out(1L).height === 45)
    assert(out(1L).channels === 3)
    assert(out(1L).features.length === 4)
    assert(out(1L).features.forall(_ > 0.9f), "white image -> luminance ~1")
    assert(out(2L).width === 64 && out(2L).height === 64)
    assert(out(2L).features.forall(_ < 0.1f), "black image -> luminance ~0")
    // non-image bytes fall back to the deterministic pseudo-decode, row kept
    assert(out.contains(3L))
    assert(out(3L).features.forall(f => f >= 0f && f < 1f))
  }

  test("JPEG decodes through the same path (JDK codec)") {
    val img = new BufferedImage(32, 16, BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    val df = Seq((9L, bos.toByteArray)).toDF("id", "content")
    val d = Multimodal.decodePartitions(df, $"id", $"content").head()
    assert(d.width === 32 && d.height === 16)
  }

  test("multimodal_decode_real query: encoded PNGs round-trip through the REAL decoder") {
    val out = graft.queries.Queries.multimodalDecodeReal(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, (w, h, bands)) =>
      assert(w === (id % 7 + 1).toInt && h === (id % 5 + 1).toInt && bands === 3,
        s"doc $id: real codec geometry, not a hash pseudo-decode")
    }
  }

  test("decode is deterministic across runs and partitionings") {
    val rows = (0L until 20L).map(i => (i, png(8 + i.toInt, 4, (i * 123456).toInt)))
    val a = Multimodal.decodePartitions(rows.toDF("id", "content").repartition(1), $"id", $"content")
      .collect().sortBy(_.id).map(d => (d.id, d.width, d.height, d.features.toSeq))
    val b = Multimodal.decodePartitions(rows.toDF("id", "content").repartition(7), $"id", $"content")
      .collect().sortBy(_.id).map(d => (d.id, d.width, d.height, d.features.toSeq))
    assert(a.toSeq === b.toSeq)
  }
}
