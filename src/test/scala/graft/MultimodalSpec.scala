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

  test("MP4 parse: synthesized boxes round-trip, v0 and v1 mvhd layouts") {
    val v0 = Multimodal.Mp4Synth.bytes("isom", 1200, 4800L,
      Seq("avc1", "mp4a"), mvhdV1 = false, width = 1920, height = 1080)
    val v1 = Multimodal.Mp4Synth.bytes("mp42", 90000, 123456L,
      Seq("hvc1"), mvhdV1 = true, width = 640, height = 360)
    val out = Multimodal.decodeVideoPartitions(
        Seq((1L, v0), (2L, v1)).toDF("id", "content"), $"id", $"content")
      .collect().map(d => d.id -> d).toMap
    assert(out(1L).brand === "isom" && out(1L).timescale === 1200L &&
      out(1L).duration_ms === 4000L && out(1L).n_tracks === 2 &&
      out(1L).codecs === "avc1,mp4a")
    assert(out(1L).width === 1920 && out(1L).height === 1080,
      "tkhd 16.16 fixed-point size must parse back")
    assert(out(2L).brand === "mp42" && out(2L).timescale === 90000L &&
      out(2L).duration_ms === 123456L * 1000L / 90000L &&
      out(2L).n_tracks === 1 && out(2L).codecs === "hvc1")
    assert(out(2L).width === 640 && out(2L).height === 360)
  }

  test("MP4 walker skips unknown boxes and tolerates box order") {
    def rawBox(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
      bb.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.put(payload)
      bb.array()
    }
    val base = Multimodal.Mp4Synth.bytes("isom", 1200, 4800L, Seq("avc1"),
      width = 640, height = 360)
    // real files carry free/skip/mdat siblings — the walker must skip them
    // wherever they appear (before ftyp, between top-level boxes, at EOF)
    val junk = rawBox("free", Array.fill[Byte](24)(0x5a)) ++
      rawBox("skip", Array.empty[Byte])
    val decorated = junk ++ base ++ rawBox("mdat", Array.fill[Byte](40)(1))
    val out = Multimodal.decodeVideoPartitions(
        Seq((1L, base), (2L, decorated)).toDF("id", "content"),
        $"id", $"content")
      .collect().map(d => d.id -> d).toMap
    assert(out(2L) === out(1L).copy(id = 2L),
      "unknown sibling boxes must not change the parse")
  }

  test("non-MP4 and truncated payloads fall back to the deterministic pseudo-decode") {
    val garbage = Array.tabulate(64)(i => (i * 37).toByte)
    val truncated = Multimodal.Mp4Synth.bytes("isom", 1200, 4800L, Seq("avc1"))
      .take(20) // cuts inside the moov header
    val out = Multimodal.decodeVideoPartitions(
        Seq((1L, garbage), (2L, truncated)).toDF("id", "content"),
        $"id", $"content")
      .collect().map(d => d.id -> d).toMap
    assert(out(1L).brand === "none" && out(1L).codecs === "")
    assert(out(2L).brand === "none",
      "a torn container must not parse as real metadata")
    // deterministic: same bytes, same pseudo fields
    val again = Multimodal.decodeVideoPartitions(
        Seq((1L, garbage)).toDF("id", "content"), $"id", $"content").head()
    assert(again === out(1L).copy(id = 1L))
  }

  test("non-16-bit audio (8-bit PCM, u-law) REALLY decodes via JDK format conversion") {
    import javax.sound.sampled._
    def encode(fmt: AudioFormat, frames: Int, typ: AudioFileFormat.Type): Array[Byte] = {
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, typ, bos)
      bos.toByteArray
    }
    val pcm8 = encode(new AudioFormat(8000f, 8, 1, false, false), 100,
      AudioFileFormat.Type.WAVE)
    val ulaw = encode(new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false), 100, AudioFileFormat.Type.AU)
    val decoder = new Multimodal.AudioDecoder
    val d8 = decoder.decode(1L, pcm8)
    val du = decoder.decode(2L, ulaw)
    // real header metadata survives the conversion (a pseudo fallback
    // would hash-derive all three fields)
    Seq(d8, du).foreach { d =>
      assert(d.sample_rate === 8000 && d.channels === 1 && d.n_frames === 100L,
        s"real format metadata expected, got $d")
      // every input byte is identical, so after a REAL uniform conversion
      // every 16-bit sample is one constant s: amp_sum = n|s|, sq_sum =
      // n·s² ⇒ amp_sum² = n·sq_sum — independent hash-derived pseudo
      // stats cannot satisfy this
      assert(d.amp_sum * d.amp_sum === 100L * d.sq_sum,
        s"constant-sample invariant must hold for a real decode: $d")
    }
    // u-law silence is a NONZERO 16-bit level (codec table), 8-bit
    // unsigned zero maps to full negative swing — both real decodes
    assert(du.amp_sum > 0L && d8.amp_sum > 0L)
  }

  test("decode is deterministic across runs and partitionings") {
    val rows = (0L until 20L).map(i => (i, png(8 + i.toInt, 4, (i * 123456).toInt)))
    val a = Multimodal.decodePartitions(rows.toDF("id", "content").repartition(1), $"id", $"content")
      .collect().sortBy(_.id).map(d => (d.id, d.width, d.height, d.features.toSeq))
    val b = Multimodal.decodePartitions(rows.toDF("id", "content").repartition(7), $"id", $"content")
      .collect().sortBy(_.id).map(d => (d.id, d.width, d.height, d.features.toSeq))
    assert(a.toSeq === b.toSeq)
  }

  test("resizeNearest: aspect-fit dims, exact nearest-neighbor pixels, no upscale") {
    // 6x3 gradient -> maxSide 4 => 4x2; out(x,y) = src(x*6/4, y*3/2)
    val img = new BufferedImage(6, 3, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 6) img.setRGB(x, y, x * 16 + y * 256)
    val out = Multimodal.resizeNearest(img, 4)
    assert(out.getWidth === 4 && out.getHeight === 2)
    for (y <- 0 until 2; x <- 0 until 4) {
      val sx = x * 6 / 4
      val sy = y * 3 / 2
      assert((out.getRGB(x, y) & 0xffffff) === (sx * 16 + sy * 256),
        s"out($x,$y) must copy src($sx,$sy)")
    }
    // already within bound: same instance, untouched dims (never upscale)
    val small = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    assert(Multimodal.resizeNearest(small, 4) eq small)
    // degenerate aspect: 100x1 -> 4x1, height floored at 1
    assert(Multimodal.fitDims(100, 1, 4) === ((4, 1)))
    assert(Multimodal.fitDims(1, 100, 4) === ((1, 4)))
  }

  test("resizePartitions: real decode -> resample, undecodable rows skipped") {
    val df = Seq(
      (1L, png(8, 4, 0x123456)),
      (2L, png(2, 2, 0xabcdef)),
      (3L, "not an image".getBytes("UTF-8")))
      .toDF("id", "content")
    val out = Multimodal.resizePartitions(df, $"id", $"content", maxSide = 4)
      .collect().map(r => r.id -> r).toMap
    assert(!out.contains(3L), "undecodable payloads have no resize")
    assert(out(1L).src_w === 8 && out(1L).src_h === 4)
    assert(out(1L).resized_w === 4 && out(1L).resized_h === 2)
    // constant-color image: checksum = rgb * sum(1 + x + y*w') over grid
    val w = 4; val h = 2
    val weights = (for (y <- 0 until h; x <- 0 until w) yield 1L + x + y.toLong * w).sum
    assert(out(1L).checksum === 0x123456L * weights)
    assert(out(2L).resized_w === 2 && out(2L).resized_h === 2, "no upscale")
  }

  test("byteSum: unsigned, empty-safe, codegen matches interpreted") {
    import graft.functions.BinaryFunctions
    val df = Seq(
      (1L, Array[Byte](0, 1, 2, -1)), // -1 = 255 unsigned
      (2L, Array.empty[Byte])).toDF("id", "b")
    val got = df.select($"id", BinaryFunctions.byteSum($"b").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === (0 + 1 + 2 + 255).toLong)
    assert(got(2L) === 0L)
  }
}
