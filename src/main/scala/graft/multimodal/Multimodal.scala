package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns plus a typed metadata struct, with decode /
  * feature-extract / resize / frame-sample operators.
  *
  * Image decode is REAL — JDK `javax.imageio` (see [[ImageIoCodec]]),
  * and audio decode is REAL — JDK `javax.sound.sampled` WAV/PCM (see
  * [[WavCodec]]); both zero added dependencies. Video decode is
  * STUBBED (containers need native libraries this environment doesn't
  * ship): `FakeCodec` derives deterministic pixels/samples from the
  * byte content, so every operator is reproducible and testable.
  * The Spark-side contracts — schema, per-partition batch processing,
  * explode shapes, partition counts — are real; swapping `FakeCodec`
  * for JavaCPP/FFmpeg bindings changes no dataflow. On a Python stack
  * the per-partition methods map 1:1 onto `mapInPandas` with the same
  * batch semantics.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, durationMs: Long, format: String)
  final case class MediaItem(media_id: Long, media_type: String,
      content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, media_type: String,
      mean_intensity: Double, byte_entropy: Double, embedding: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame_ts_ms: Long,
      frame_bytes: Array[Byte])

  /** Real image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF
    * readers ship with the JDK — zero added dependencies). Pixels come
    * back as row-major 8-bit luminance (ITU-R BT.601 integer weights).
    * Returns None when the bytes aren't a decodable image, so callers
    * fall back to [[FakeCodec]] for synthetic or unsupported content —
    * audio/video stay honestly stubbed.
    */
  object ImageIoCodec {
    def decode(content: Array[Byte]): Option[Array[Byte]] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              out(y * w + x) = lum.toByte
              x += 1
            }
            y += 1
          }
          Some(out)
        }
      } catch {
        // ImageIO plugin readers throw RuntimeExceptions (IAE,
        // CMMException, AIOOBE…) on corrupt-but-recognized bytes, not
        // just IOException — any decode failure degrades to the stub
        // path rather than failing the Spark task
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * PCM readers ship with the JDK — zero added dependencies, same
    * pattern as [[ImageIoCodec]]). Output is one 8-bit unsigned sample
    * per frame (first channel, most-significant byte, signed PCM
    * re-biased to center 128) — the audio analogue of the image path's
    * 8-bit luminance, so downstream feature extraction is uniform.
    * Returns None for non-audio or unsupported bytes → [[FakeCodec]]
    * fallback; video stays honestly stubbed (containers need native
    * libs this environment doesn't ship).
    */
  object WavCodec {
    def decode(content: Array[Byte]): Option[Array[Byte]] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val fmt = ais.getFormat
          val frameSize = fmt.getFrameSize
          val bits = fmt.getSampleSizeInBits
          if (frameSize <= 0 || bits <= 0) None
          else {
            val raw = ais.readAllBytes()
            val bytesPerSample = math.max(1, bits / 8)
            val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val n = raw.length / frameSize
            val out = new Array[Byte](n)
            var i = 0
            while (i < n) {
              val off = i * frameSize
              val msb = if (fmt.isBigEndian) raw(off) else raw(off + bytesPerSample - 1)
              out(i) = if (signed) (msb ^ 0x80).toByte else msb
              i += 1
            }
            Some(out)
          }
        } finally ais.close()
      } catch {
        // UnsupportedAudioFileException on non-audio bytes; malformed
        // headers can also throw runtime exceptions — degrade to stub
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** STUB codec — deterministic fakes standing in for real decoders
    * (video; and non-decodable synthetic "image"/"audio" bytes). */
  object FakeCodec {
    /** "Decode" = the raw bytes are the pixel/sample buffer. */
    def decode(content: Array[Byte]): Array[Byte] = content

    /** Deterministic d-dim embedding from a rolling hash per stripe. */
    def embed(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) {
        h = h * 31 + (content(i) & 0xff)
        out(i % dim) += ((h % 1000).toFloat / 1000.0f)
        i += 1
      }
      out
    }

    /** "Resize" = proportional byte subsample to the new pixel count. */
    def resize(content: Array[Byte], meta: MediaMeta, w: Int, h: Int): (Array[Byte], MediaMeta) = {
      val target = math.max(1, content.length.toLong * (w.toLong * h) /
        math.max(1L, meta.width.toLong * meta.height)).toInt
      val step = math.max(1, content.length / math.max(1, target))
      (content.grouped(step).map(_.head).toArray, meta.copy(width = w, height = h))
    }
  }

  /** Deterministic synthetic corpus (seeded) — binary blobs + metadata. */
  def synthesize(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val rnd = new scala.util.Random(seed + id)
      val mediaType = Seq("image", "audio", "video")(rnd.nextInt(3))
      val len = 256 + rnd.nextInt(768)
      val content = Array.fill(len)(rnd.nextInt(256).toByte)
      val meta = mediaType match {
        case "image" => MediaMeta(64 + rnd.nextInt(512), 64 + rnd.nextInt(512), 0L, "fake-png")
        case "audio" => MediaMeta(0, 0, 1000L + rnd.nextInt(60000), "fake-wav")
        case _       => MediaMeta(320, 240, 1000L + rnd.nextInt(60000), "fake-mp4")
      }
      MediaItem(id, mediaType, content, meta)
    }
  }

  /** Feature extraction: decode + per-item statistics + embedding,
    * processed per partition (the `mapInPandas` batch shape) — no
    * per-row task overhead, bounded memory per batch.
    */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 16): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        // images and audio go through the real JDK decoders when the
        // bytes are decodable; everything else (video, synthetic
        // blobs) uses the stub
        val px = m.media_type match {
          case "image" => ImageIoCodec.decode(m.content).getOrElse(FakeCodec.decode(m.content))
          case "audio" => WavCodec.decode(m.content).getOrElse(FakeCodec.decode(m.content))
          case _ => FakeCodec.decode(m.content)
        }
        val mean = if (px.isEmpty) 0.0 else px.map(b => (b & 0xff).toDouble).sum / px.length
        val counts = new Array[Long](256)
        px.foreach(b => counts(b & 0xff) += 1)
        val n = px.length.toDouble
        val entropy = counts.filter(_ > 0)
          .map { c => val p = c / n; -p * math.log(p) / math.log(2.0) }.sum
        MediaFeatures(m.media_id, m.media_type, mean, entropy, FakeCodec.embed(px, dim))
      }
    }
  }

  /** Resize images (others pass through untouched). */
  def resizeImages(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.map {
      case m if m.media_type == "image" =>
        val (c, meta) = FakeCodec.resize(m.content, m.meta, w, h)
        m.copy(content = c, meta = meta)
      case m => m
    }
  }

  /** Frame sampling: one row per sampled frame at `everyMs` intervals —
    * the explode shape a video pipeline needs (frame count from
    * duration metadata, bytes carved deterministically from content).
    */
  def sampleFrames(items: Dataset[MediaItem], everyMs: Long = 1000L): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.filter(_.media_type == "video").flatMap { m =>
      val nFrames = math.max(1, (m.meta.durationMs / everyMs).toInt)
      val chunk = math.max(1, m.content.length / nFrames)
      (0 until nFrames).iterator.map { i =>
        val start = math.min(i * chunk, m.content.length - 1)
        val end = math.min(start + chunk, m.content.length)
        Frame(m.media_id, i, i * everyMs, m.content.slice(start, end))
      }
    }
  }

  /** Columnar view: binary + struct metadata as a DataFrame table shape
    * (what a parquet multimodal table looks like at rest).
    */
  def asTable(items: Dataset[MediaItem]): DataFrame =
    items.toDF().select(col("media_id"), col("media_type"),
      col("content"), col("meta.width"), col("meta.height"),
      col("meta.durationMs").as("duration_ms"), col("meta.format"))
}
