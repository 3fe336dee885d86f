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
        val fmt = ais.getFormat
        val rate = fmt.getSampleRate.toInt
        val ch = fmt.getChannels
        val frames = ais.getFrameLength
        val big = fmt.isBigEndian
        val data = ais.readAllBytes()
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
