package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct, and decode/feature steps
  * run as partition-local transformations over the binary bytes.
  *
  * The Spark-side contract — schema, partition-preserving batch shape,
  * deterministic outputs — is real and tested. Image decode is REAL:
  * [[decodePartitions]] runs `javax.imageio` (PNG/JPEG/GIF/BMP ship with the
  * JDK) one decoder per partition, reading true dimensions and pixel-derived
  * luminance features; payloads that are not decodable images fall back to a
  * deterministic pseudo-decode so the pipeline is total over mixed corpora.
  * Audio/video codecs (not in the JDK) remain stubbed: `featuresStub` /
  * `sampleSlices` keep a real decoder's signature and batch shape.
  */
object Multimodal {

  /** Metadata struct carried alongside every binary payload. */
  val mediaMeta: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Wrap a binary column into (content, meta) — the canonical multimodal
    * column pair. Checksum is xxhash64 for cheap integrity checks. */
  def withMeta(df: DataFrame, content: Column, mime: String): DataFrame =
    df.withColumn("content", content.cast("binary"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        length(col("content")).cast("long").as("n_bytes"),
        xxhash64(col("content")).as("checksum")))

  /** STUB image decode: a real implementation would decode the codec header;
    * this derives deterministic pseudo-dimensions from the checksum so the
    * downstream plumbing (schema, nullability, distribution) is exercised
    * honestly. Runs as a codegen-friendly column expression — a real decoder
    * would switch to mapPartitions with a reused decoder instance. */
  def decodeStub(content: Column): Column = {
    val h = xxhash64(content)
    struct(
      (pmod(h, lit(1920L)) + 1).cast("int").as("width"),
      (pmod(shiftright(h, 16), lit(1080L)) + 1).cast("int").as("height"),
      lit(3).cast("int").as("channels"))
  }

  /** STUB feature extraction: 8 deterministic pseudo-features per payload
    * (a real implementation embeds pixels; the pipeline shape — fixed-width
    * float array per row — is identical). */
  def featuresStub(content: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(content, i), lit(1000L)).cast("float") / 1000.0f))

  /** Byte-range sampling — the frame-sample analog: pick `n` evenly spaced
    * slices of `sliceBytes` from the payload (a real video sampler seeks
    * keyframes; the partition-local slicing shape is the same). */
  def sampleSlices(content: Column, n: Int, sliceBytes: Int): Column =
    transform(sequence(lit(0), lit(n - 1)), i => {
      val len = length(content)
      val start = (i * greatest(len - sliceBytes, lit(1)) / lit(math.max(n - 1, 1))) + 1
      substring(content, start.cast("int"), lit(sliceBytes))
    })

  /** Decoded-media record produced by the partition-local decode path. */
  case class DecodedMedia(
      id: Long,
      width: Int,
      height: Int,
      channels: Int,
      features: Array[Float])

  /** Partition-local batch decode: `mapPartitions` with ONE decoder instance
    * per partition (decoder state is expensive; per-row init would dominate),
    * rows decoded in a streaming loop. The decoder is [[ImageDecoder]] —
    * real `javax.imageio` for image payloads, deterministic pseudo-decode
    * for everything else.
    *
    * Input: (id: Long, content: binary). Distribution, batch shape, schema,
    * and failure behavior (null-safe skip, non-image fallback) are tested.
    */
  def decodePartitions(
      df: DataFrame,
      id: Column,
      content: Column,
      featureDim: Int = 8): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("id"), content.cast("binary").as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new ImageDecoder(featureDim) // one instance per partition
        rows.collect { case (i, bytes) if bytes != null =>
          decoder.decode(i, bytes)
        }
      }
  }

  /** Real JDK image decoder: `javax.imageio.ImageIO.read` over the payload
    * bytes — PNG/JPEG/GIF/BMP decode with no external dependency. Emits true
    * width/height/band-count and `featureDim` luminance means over vertical
    * strips (pixel-derived, in [0, 1], stride-sampled so cost is bounded for
    * huge images). Payloads ImageIO cannot decode (e.g. this corpus's text
    * bytes) fall back to [[StubDecoder]]'s deterministic pseudo-decode, so
    * mixed corpora flow without a filter pass. ImageIO's disk cache is off —
    * decode never touches executor-local disk. */
  final class ImageDecoder(featureDim: Int) extends Serializable {
    private val fallback = new StubDecoder(featureDim)
    // once per decoder instance (JVM-global flag; per-row would be a
    // million redundant static writes on the hot path)
    javax.imageio.ImageIO.setUseCache(false)

    def decode(id: Long, bytes: Array[Byte]): DecodedMedia = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) fallback.decode(id, bytes)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val feats = new Array[Float](featureDim)
        val yStep = math.max(1, h / 64)
        var s = 0
        while (s < featureDim) {
          val x0 = (w.toLong * s / featureDim).toInt
          val x1 = math.min(math.max((w.toLong * (s + 1) / featureDim).toInt, x0 + 1), w)
          val xStep = math.max(1, (x1 - x0) / 64)
          var sum = 0.0
          var n = 0L
          var y = 0
          while (y < h) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              n += 1
              x += xStep
            }
            y += yStep
          }
          feats(s) = if (n == 0) 0f else (sum / n / 255.0).toFloat
          s += 1
        }
        DecodedMedia(id, w, h, img.getRaster.getNumBands, feats)
      }
    }
  }

  /** Resized-image record produced by the partition-local resize path:
    * source dims, aspect-fit output dims, and a position-weighted pixel
    * checksum of the RESIZED image — Σ (1 + x + y·w') · rgb'(x, y) — so an
    * oracle that can replay the source pixels can verify the resample
    * byte-for-byte (a dimension-only check would pass a resize that
    * scrambled every pixel). */
  case class ResizedMedia(
      id: Long,
      src_w: Int,
      src_h: Int,
      resized_w: Int,
      resized_h: Int,
      checksum: Long)

  /** Aspect-fit output dims for a `maxSide` bound, integer arithmetic only
    * (floor((side·maxSide)/longSide), floored at 1): never upscales, and
    * both engines replay the division exactly — no float scale factor. */
  def fitDims(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxSide) (w, h)
    else (math.max(1, w * maxSide / m), math.max(1, h * maxSide / m))
  }

  /** REAL nearest-neighbor resample of a decoded image to aspect-fit
    * `maxSide`: output pixel (x, y) copies source pixel
    * (⌊x·w/w'⌋, ⌊y·h/h'⌋). Our own integer loop rather than
    * `Graphics2D.drawImage` — AWT's scaler is implementation-defined
    * (interpolation, rounding), so its pixels are not reproducible across
    * JVMs; nearest-neighbor with floor arithmetic is, which is what makes
    * the resize oracle-able. */
  def resizeNearest(
      img: java.awt.image.BufferedImage,
      maxSide: Int): java.awt.image.BufferedImage = {
    val w = img.getWidth
    val h = img.getHeight
    val (dw, dh) = fitDims(w, h, maxSide)
    if (dw == w && dh == h) img
    else {
      val out = new java.awt.image.BufferedImage(
        dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < dh) {
        val sy = y * h / dh
        var x = 0
        while (x < dw) {
          out.setRGB(x, y, img.getRGB(x * w / dw, sy))
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Partition-local decode + aspect-fit resize: one decoder per partition
    * ([[decodePartitions]]'s distribution shape — binary payloads never
    * shuffle, the resize is a row-local pass). Non-decodable payloads are
    * SKIPPED (a resize of undecodable bytes has no meaning — unlike
    * [[decodePartitions]], there is no pseudo fallback to resize).
    * Input: (id: Long, content: binary). */
  def resizePartitions(
      df: DataFrame,
      id: Column,
      content: Column,
      maxSide: Int): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("id"), content.cast("binary").as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (i, bytes) =>
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              catch { case _: Exception => null }
          if (img == null) None
          else {
            val out = resizeNearest(img, maxSide)
            val dw = out.getWidth
            val dh = out.getHeight
            var sum = 0L
            var y = 0
            while (y < dh) {
              var x = 0
              while (x < dw) {
                sum += (1L + x + y.toLong * dw) * (out.getRGB(x, y) & 0xffffff)
                x += 1
              }
              y += 1
            }
            Some(ResizedMedia(i, img.getWidth, img.getHeight, dw, dh, sum))
          }
        }
      }
  }

  /** Decoded-audio record produced by the partition-local audio path.
    * `amp_sum`/`sq_sum` are integer-exact PCM statistics (sum of |s| and of
    * s², both over all interleaved 16-bit samples) so an oracle can replay
    * them bit-for-bit — a float RMS would drift across platforms. */
  case class DecodedAudio(
      id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      amp_sum: Long,
      sq_sum: Long)

  /** Partition-local audio decode: one [[AudioDecoder]] per partition, same
    * batch shape as [[decodePartitions]]. Input: (id: Long, content: binary
    * WAV/AIFF payloads). */
  def decodeAudioPartitions(
      df: DataFrame,
      id: Column,
      content: Column): Dataset[DecodedAudio] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("id"), content.cast("binary").as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new AudioDecoder // one instance per partition
        rows.collect { case (i, bytes) if bytes != null =>
          decoder.decode(i, bytes)
        }
      }
  }

  /** Real JDK audio decoder: `javax.sound.sampled.AudioSystem` parses
    * WAV/AIFF/AU containers with no external dependency. Reads true format
    * metadata (sample rate, channel count, frame length) from the codec
    * header and decodes the 16-bit PCM frames — honoring the container's
    * declared endianness (WAV little, AIFF big) — into exact integer
    * amplitude statistics. Payloads the JDK cannot parse fall back to a
    * deterministic pseudo-decode so mixed corpora flow without a filter
    * pass, mirroring [[ImageDecoder]]'s treatment. */
  final class AudioDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): DecodedAudio = {
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (ais == null) pseudo(id, bytes)
      else {
        // the integer-exact statistics below assume 16-bit signed PCM; a
        // parseable-but-different payload (8-bit PCM, u-law/a-law AU)
        // goes through the JDK's format conversion first — a REAL decode
        // of those corpora rather than a fallback — and anything the
        // conversion chain cannot produce (or a header with an
        // unspecified/zero rate) still falls back, mirroring
        // ImageDecoder: decode fully or not at all
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        val src = ais.getFormat
        val conv =
          if (src.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
              src.getSampleSizeInBits == 16) ais
          else if (src.getSampleRate <= 0 || src.getChannels <= 0) null
          else
            try AudioSystem.getAudioInputStream(
              new AudioFormat(src.getSampleRate, 16, src.getChannels,
                true, src.isBigEndian), ais)
            catch { case _: Exception => null }
        if (conv == null) return pseudo(id, bytes)
        val fmt = conv.getFormat
        val rate = fmt.getSampleRate.toInt
        val ch = fmt.getChannels
        val big = fmt.isBigEndian
        if (rate <= 0 || ch <= 0) return pseudo(id, bytes)
        val data = conv.readAllBytes()
        // header frame count when declared, else derived from the decoded
        // byte count (a malformed header must not kill the task — ADVICE)
        val frames =
          if (conv.getFrameLength >= 0) conv.getFrameLength
          else data.length.toLong / (2L * ch)
        var ampSum = 0L
        var sqSum = 0L
        var i = 0
        while (i + 1 < data.length) {
          val s =
            if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort.toInt
            else ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toInt
          ampSum += math.abs(s)
          sqSum += s.toLong * s
          i += 2
        }
        DecodedAudio(id, rate, ch, frames, frames * 1000L / rate, ampSum, sqSum)
      }
    }

    /** Deterministic fallback for non-audio payloads (FNV-1a over bytes,
      * like [[StubDecoder]]). */
    private def pseudo(id: Long, bytes: Array[Byte]): DecodedAudio = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L
        i += 1
      }
      val rate = 8000 + (math.abs(h % 3L)).toInt * 4000
      val frames = 50L + math.abs((h >> 8) % 151L)
      DecodedAudio(id, rate, 1, frames, frames * 1000L / rate,
        math.abs(h % 1000000L), math.abs((h >> 16) % 1000000L))
    }
  }

  /** Decoded-video record from the header-only container parse: format
    * metadata only (no frame decode — video CODECS are not in the JDK, but
    * the CONTAINER is pure byte arithmetic and that is what corpus
    * curation filters on: duration, track count, codec identity). */
  case class DecodedVideo(
      id: Long,
      brand: String,
      timescale: Long,
      duration_ms: Long,
      n_tracks: Int,
      width: Int,
      height: Int,
      codecs: String)

  /** Partition-local video container parse: one [[VideoDecoder]] per
    * partition, same batch shape as [[decodePartitions]]. Input:
    * (id: Long, content: binary MP4 payloads). */
  def decodeVideoPartitions(
      df: DataFrame,
      id: Column,
      content: Column): Dataset[DecodedVideo] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("id"), content.cast("binary").as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new VideoDecoder // one instance per partition
        rows.collect { case (i, bytes) if bytes != null =>
          decoder.decode(i, bytes)
        }
      }
  }

  /** Real MP4 (ISO BMFF) container parser — header-only, no external
    * dependency: walks the box tree (`[size:4][type:4][payload]`, 64-bit
    * `size==1` largesize and `size==0` to-EOF forms included), reading the
    * `ftyp` major brand, `moov/mvhd` timescale + duration (version 0 and
    * 1 layouts), the `trak` count, the first track's `tkhd` presentation
    * size (16.16 fixed-point width/height, v0 and v1 offsets), and each
    * track's first `stsd` sample
    * entry fourcc — the codec identity filters select on. Any payload
    * that is not a well-formed MP4 with an mvhd falls back to a
    * deterministic pseudo-decode, mirroring [[ImageDecoder]] /
    * [[AudioDecoder]]. Format: ISO/IEC 14496-12 (public). */
  final class VideoDecoder extends Serializable {

    def decode(id: Long, bytes: Array[Byte]): DecodedVideo =
      try parse(id, bytes).getOrElse(pseudo(id, bytes))
      catch { case _: Exception => pseudo(id, bytes) }

    private def u16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Visit each box in [start, end): (type, payloadStart, payloadEnd). */
    private def boxes(b: Array[Byte], start: Int, end: Int)(
        f: (String, Int, Int) => Unit): Boolean = {
      var o = start
      while (o < end) {
        if (o + 8 > end) return false
        val size32 = u32(b, o)
        val typ = fourcc(b, o + 4)
        val (payload, boxEnd) =
          if (size32 == 1L) {
            if (o + 16 > end) return false
            val sz = u64(b, o + 8)
            if (sz < 16 || o + sz > end) return false
            (o + 16, o + sz.toInt)
          } else if (size32 == 0L) (o + 8, end) // box extends to EOF
          else {
            if (size32 < 8 || o + size32 > end) return false
            (o + 8, o + size32.toInt)
          }
        f(typ, payload, boxEnd)
        o = boxEnd
      }
      true
    }

    private def firstBox(b: Array[Byte], start: Int, end: Int,
        typ: String): Option[(Int, Int)] = {
      var found: Option[(Int, Int)] = None
      boxes(b, start, end) { (t, p, e) =>
        if (found.isEmpty && t == typ) found = Some((p, e))
      }
      found
    }

    private def parse(id: Long, b: Array[Byte]): Option[DecodedVideo] = {
      var brand: String = null
      var timescale = -1L
      var duration = -1L
      var nTracks = 0
      var width = 0
      var height = 0
      val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
      val ok = boxes(b, 0, b.length) { (typ, p, e) =>
        typ match {
          case "ftyp" if e - p >= 4 => brand = fourcc(b, p)
          case "moov" =>
            boxes(b, p, e) { (t2, p2, e2) =>
              t2 match {
                case "mvhd" =>
                  val version = b(p2) & 0xff
                  if (version == 1 && e2 - p2 >= 32) {
                    timescale = u32(b, p2 + 20)
                    duration = u64(b, p2 + 24)
                  } else if (version == 0 && e2 - p2 >= 20) {
                    timescale = u32(b, p2 + 12)
                    duration = u32(b, p2 + 16)
                  }
                case "trak" =>
                  nTracks += 1
                  if (width == 0 && height == 0)
                    // tkhd v0: width/height as 16.16 fixed at offsets
                    // 76/80 of the payload; v1's 64-bit times push them
                    // to 88/92 (ISO 14496-12 §8.3.2)
                    firstBox(b, p2, e2, "tkhd").foreach { case (tp, te) =>
                      val v = b(tp) & 0xff
                      val (wo, ho) = if (v == 1) (88, 92) else (76, 80)
                      if (te - tp >= ho + 4) {
                        width = (u32(b, tp + wo) >> 16).toInt
                        height = (u32(b, tp + ho) >> 16).toInt
                      }
                    }
                  for {
                    (mp, me) <- firstBox(b, p2, e2, "mdia")
                    (ip, ie) <- firstBox(b, mp, me, "minf")
                    (sp, se) <- firstBox(b, ip, ie, "stbl")
                    (dp, de) <- firstBox(b, sp, se, "stsd")
                    // stsd payload: ver/flags(4) entry_count(4) then sample
                    // entries, each [size:4][format:4]...
                    if de - dp >= 16 && u32(b, dp + 4) > 0
                  } codecs += fourcc(b, dp + 12)
                case _ => ()
              }
            }
            ()
          case _ => ()
        }
      }
      if (ok && brand != null && timescale > 0 && duration >= 0)
        Some(DecodedVideo(id, brand, timescale,
          duration * 1000L / timescale, nTracks, width, height,
          codecs.mkString(",")))
      else None
    }

    /** Deterministic fallback for non-MP4 payloads (FNV-1a over bytes,
      * like the other decoders' fallbacks). */
    private def pseudo(id: Long, bytes: Array[Byte]): DecodedVideo = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L
        i += 1
      }
      val ts = 600L + math.abs(h % 4L) * 300L
      val dur = 1000L + math.abs((h >> 8) % 5000L)
      DecodedVideo(id, "none", ts, dur * 1000L / ts,
        (1 + math.abs((h >> 16) % 3L)).toInt, 0, 0, "")
    }
  }

  /** Minimal deterministic MP4 synthesizer — the container counterpart of
    * the audio query's WAV synthesis: real `ftyp`/`moov`/`mvhd`/`trak`/
    * `mdia`/`minf`/`stbl`/`stsd` boxes (no media data), so the decode
    * query and specs can round-trip [[VideoDecoder]] against arithmetic a
    * SQL oracle replays. `mvhdV1` emits the 64-bit version-1 mvhd layout
    * to exercise both parser paths. */
  object Mp4Synth {
    private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length)
      out.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.put(payload)
      out.array()
    }

    private def mvhd(timescale: Int, duration: Long, v1: Boolean): Array[Byte] = {
      val body =
        if (v1) {
          val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 4 + 8 + 80)
          bb.putInt(0x01000000) // version 1, flags 0
          bb.putLong(0L).putLong(0L) // ctime, mtime (64-bit)
          bb.putInt(timescale)
          bb.putLong(duration)
          bb // rate/volume/reserved/matrix/predefined/next_track: zeros
        } else {
          val bb = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 4 + 4 + 80)
          bb.putInt(0) // version 0, flags 0
          bb.putInt(0).putInt(0) // ctime, mtime
          bb.putInt(timescale)
          bb.putInt(duration.toInt)
          bb
        }
      box("mvhd", body.array())
    }

    private def trak(codec: String, width: Int, height: Int): Array[Byte] = {
      // tkhd v0 (84-byte body): width/height as 16.16 fixed at 76/80
      val tkhd = java.nio.ByteBuffer.allocate(84)
      tkhd.position(76)
      tkhd.putInt(width << 16)
      tkhd.putInt(height << 16)
      val entry = java.nio.ByteBuffer.allocate(16)
      entry.putInt(16)
      entry.put(codec.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      entry.put(new Array[Byte](6)) // reserved
      entry.putShort(1) // data_reference_index
      val stsd = java.nio.ByteBuffer.allocate(8 + 16)
      stsd.putInt(0) // version/flags
      stsd.putInt(1) // entry_count
      stsd.put(entry.array())
      box("trak", box("tkhd", tkhd.array()) ++
        box("mdia", box("minf", box("stbl", box("stsd", stsd.array())))))
    }

    /** A complete headers-only MP4. */
    def bytes(
        brand: String,
        timescale: Int,
        duration: Long,
        codecs: Seq[String],
        mvhdV1: Boolean = false,
        width: Int = 0,
        height: Int = 0): Array[Byte] = {
      val ftypPayload = java.nio.ByteBuffer.allocate(12)
      ftypPayload.put(brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      ftypPayload.putInt(0x200) // minor_version
      ftypPayload.put("isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val moovPayload =
        mvhd(timescale, duration, mvhdV1) ++
          codecs.flatMap(trak(_, width, height))
      box("ftyp", ftypPayload.array()) ++ box("moov", moovPayload)
    }
  }

  /** Deterministic stand-in for a native media decoder. Holds "expensive"
    * per-partition state (the feature buffer) like a real codec context. */
  final class StubDecoder(featureDim: Int) extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): DecodedMedia = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L
        i += 1
      }
      val feats = new Array[Float](featureDim)
      var j = 0
      var x = h
      while (j < featureDim) {
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
        feats(j) = math.abs(x % 1000L).toFloat / 1000.0f
        j += 1
      }
      DecodedMedia(id,
        width = (math.abs(h % 1920L) + 1).toInt,
        height = (math.abs((h >> 16) % 1080L) + 1).toInt,
        channels = 3,
        features = feats)
    }
  }

  /** Resize stub: deterministic target-size recompute of the decode struct. */
  def resizeStub(decoded: Column, maxSide: Int): Column = {
    val w = decoded.getField("width")
    val h = decoded.getField("height")
    val scale = lit(maxSide.toDouble) / greatest(w, h).cast("double")
    struct(
      least(w, ceil(w.cast("double") * scale).cast("int")).as("width"),
      least(h, ceil(h.cast("double") * scale).cast("int")).as("height"),
      decoded.getField("channels").as("channels"))
  }
}
