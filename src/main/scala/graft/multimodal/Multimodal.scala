package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns plus a typed metadata struct, with decode /
  * feature-extract / resize / frame-sample operators.
  *
  * All three modalities decode for REAL with zero added dependencies:
  * images via JDK `javax.imageio` ([[ImageIoCodec]]), audio via JDK
  * `javax.sound.sampled` WAV/PCM ([[WavCodec]]), and video via a
  * from-scratch RIFF/AVI container parser ([[AviCodec]]) whose MJPEG
  * frames decode through the same `ImageIO` JPEG reader and whose
  * uncompressed DIB frames decode through hand-rolled bottom-up
  * BGR→luminance math. Bytes that no real decoder recognizes degrade
  * to the deterministic [[FakeCodec]] so corrupt content never fails a
  * Spark task. The Spark-side contracts — schema, per-partition batch
  * processing, explode shapes, partition counts — are the point;
  * swapping in JavaCPP/FFmpeg bindings for exotic codecs changes no
  * dataflow. On a Python stack the per-partition methods map 1:1 onto
  * `mapInPandas` with the same batch semantics.
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
      decodeDims(content).map(_._3)

    /** Like [[decode]] but keeps the decoded dimensions — the sidecar
      * oracle (q54) checks them against authored truth. */
    def decodeDims(content: Array[Byte]): Option[(Int, Int, Array[Byte])] =
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
          Some((w, h, out))
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
      decodeWithRate(content).map(_._2)

    /** Like [[decode]] but keeps the sample rate — the sidecar oracle
      * (q54) derives duration_ms = n·1000/rate from it. */
    def decodeWithRate(content: Array[Byte]): Option[(Int, Array[Byte])] =
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
            Some((fmt.getSampleRate.toInt, out))
          }
        } finally ais.close()
      } catch {
        // UnsupportedAudioFileException on non-audio bytes; malformed
        // headers can also throw runtime exceptions — degrade to stub
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** Real video decode: a from-scratch RIFF/AVI container parser (the
    * format is public — MSDN "AVI RIFF File Reference"). Zero added
    * dependencies, same pattern as [[ImageIoCodec]]/[[WavCodec]]:
    * MJPEG (`00dc`) frames are standalone JPEGs and decode through the
    * JDK `ImageIO` reader; uncompressed DIB (`00db`) frames are
    * bottom-up 24-bit BGR rows padded to 4-byte stride and decode with
    * integer BT.601 luminance — bit-exact, no codec involved. Returns
    * None for non-AVI bytes → [[FakeCodec]] fallback.
    *
    * [[encode]] is the matching minimal writer (hdrl/avih/strl/movi),
    * used by [[Multimodal.synthesize]] and the spec fixtures so the
    * decode path is exercised by real container bytes end-to-end.
    */
  object AviCodec {

    /** Parsed container: frame bytes stay encoded (`compressed` =
      * `00dc`/MJPEG vs `00db`/DIB); [[frameLuminance]] decodes one. */
    final case class AviVideo(width: Int, height: Int, microSecPerFrame: Long,
        frames: IndexedSeq[(Boolean, Array[Byte])]) {
      def durationMs: Long = frames.length.toLong * microSecPerFrame / 1000L
    }

    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def decode(content: Array[Byte]): Option[AviVideo] =
      try {
        if (content.length < 12 || fourcc(content, 0) != "RIFF" ||
          fourcc(content, 8) != "AVI ") return None
        var width = 0
        var height = 0
        var uspf = 0L
        val frames = IndexedSeq.newBuilder[(Boolean, Array[Byte])]
        // RIFF is a tree: chunks are fourcc+size+data (even-padded);
        // LIST chunks hold a 4-byte type then sub-chunks. One recursive
        // walk collects the avih header and every stream-0 frame chunk
        // (including ones nested in 'rec ' lists).
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (off + 8 <= end) {
            val cc = fourcc(content, off)
            val sz = u32(content, off + 4).toInt
            val dataStart = off + 8
            val dataEnd = math.min(dataStart.toLong + sz, end.toLong).toInt
            if (cc == "LIST" && dataEnd >= dataStart + 4)
              walk(dataStart + 4, dataEnd)
            else if (cc == "avih" && sz >= 40) {
              uspf = u32(content, dataStart)
              width = u32(content, dataStart + 32).toInt
              height = u32(content, dataStart + 36).toInt
            } else if (cc.charAt(0).isDigit && cc.charAt(1).isDigit &&
              (cc.endsWith("db") || cc.endsWith("dc")) && sz > 0 && dataEnd > dataStart)
              frames += ((cc.endsWith("dc"),
                java.util.Arrays.copyOfRange(content, dataStart, dataEnd)))
            off = dataStart + sz + (sz & 1)
          }
        }
        walk(12, math.min(content.length.toLong, 8L + u32(content, 4)).toInt)
        val fs = frames.result()
        if (fs.isEmpty || width <= 0 || height <= 0) None
        else Some(AviVideo(width, height, if (uspf > 0) uspf else 40000L, fs))
      } catch {
        case scala.util.control.NonFatal(_) => None
      }

    /** Decode frame `i` to row-major 8-bit luminance (same output
      * contract as [[ImageIoCodec.decode]]). */
    def frameLuminance(v: AviVideo, i: Int): Option[Array[Byte]] = {
      val (compressed, bytes) = v.frames(i)
      if (compressed) ImageIoCodec.decode(bytes) else decodeDib(bytes, v.width, v.height)
    }

    /** Uncompressed `00db` frame: bottom-up 24bpp BGR, rows padded to a
      * 4-byte stride (the DIB on-disk layout). */
    private def decodeDib(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
      val stride = ((w * 3 + 3) / 4) * 4
      if (w <= 0 || h <= 0 || bytes.length < stride * h) None
      else {
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          val row = (h - 1 - y) * stride
          var x = 0
          while (x < w) {
            val bl = bytes(row + x * 3) & 0xff
            val g = bytes(row + x * 3 + 1) & 0xff
            val r = bytes(row + x * 3 + 2) & 0xff
            out(y * w + x) = ((r * 299 + g * 587 + bl * 114) / 1000).toByte
            x += 1
          }
          y += 1
        }
        Some(out)
      }
    }

    /** Minimal writer: RIFF(AVI  LIST(hdrl avih LIST(strl strh strf))
      * LIST(movi frames…)). `frames` are already-encoded per-frame
      * bytes — JPEGs when `mjpeg`, raw padded DIB rows otherwise.
      */
    def encode(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]],
        mjpeg: Boolean): Array[Byte] = {
      def le32(v: Long): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def cc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      def chunk(tag: String, data: Array[Byte]): Array[Byte] =
        cc(tag) ++ le32(data.length.toLong) ++ data ++
          (if ((data.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)
      def list(tp: String, data: Array[Byte]): Array[Byte] = chunk("LIST", cc(tp) ++ data)
      val uspf = 1000000L / fps
      val avih = le32(uspf) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(width.toLong) ++ le32(height.toLong) ++ Array.fill(16)(0.toByte)
      val strh = cc("vids") ++ cc(if (mjpeg) "MJPG" else "DIB ") ++
        le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(fps.toLong) ++
        le32(0) ++ le32(frames.length.toLong) ++ le32(0) ++ le32(0xffffffffL) ++
        le32(0) ++ le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
      val strf = le32(40) ++ le32(width.toLong) ++ le32(height.toLong) ++
        le16(1) ++ le16(24) ++ (if (mjpeg) cc("MJPG") else le32(0)) ++
        le32(width.toLong * height * 3) ++ Array.fill(16)(0.toByte)
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val tag = if (mjpeg) "00dc" else "00db"
      val movi = list("movi", frames.iterator.flatMap(f => chunk(tag, f)).toArray)
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ le32(body.length.toLong) ++ body
    }
  }

  /** STUB codec — deterministic fakes standing in for real decoders
    * (non-decodable synthetic bytes, exotic codecs). */
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

  /** Deterministic synthetic corpus (seeded) — REAL media bytes, so the
    * real decoders run end-to-end on the synthetic pipeline: images are
    * seeded-pixel PNGs (`ImageIO`), audio is seeded 16-bit mono PCM
    * WAV (`AudioSystem`), video is a seeded MJPEG AVI ([[AviCodec]]).
    * Encoding happens per row on executors — no driver materialization.
    */
  def synthesize(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val rnd = new scala.util.Random(seed + id)
      rnd.nextInt(3) match {
        case 0 =>
          val w = 8 + rnd.nextInt(24)
          val h = 8 + rnd.nextInt(24)
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rnd.nextInt(1 << 24)); x += 1 }
            y += 1
          }
          MediaItem(id, "image", pngBytes(img), MediaMeta(w, h, 0L, "png"))
        case 1 =>
          val nSamples = 400 + rnd.nextInt(1600)
          val pcm = new Array[Byte](nSamples * 2)
          rnd.nextBytes(pcm)
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaItem(id, "audio", bos.toByteArray,
            MediaMeta(0, 0, nSamples * 1000L / 8000L, "wav"))
        case _ =>
          val w = 16
          val h = 16
          val fps = 5
          val nFrames = 2 + rnd.nextInt(9)
          val frames = (0 until nFrames).map { _ =>
            val c = rnd.nextInt(1 << 24)
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { img.setRGB(x, y, c); x += 1 }
              y += 1
            }
            jpegBytes(img)
          }
          MediaItem(id, "video", AviCodec.encode(w, h, fps, frames, mjpeg = true),
            MediaMeta(w, h, nFrames * 1000L / fps, "avi-mjpg"))
      }
    }
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false) // in-memory encode, no temp files per call
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Feature extraction: decode + per-item statistics + embedding,
    * processed per partition (the `mapInPandas` batch shape) — no
    * per-row task overhead, bounded memory per batch.
    */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 16): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        // every modality goes through its real decoder when the bytes
        // are decodable (video = all frames' luminance, concatenated);
        // unrecognized bytes use the stub
        val px = m.media_type match {
          case "image" => ImageIoCodec.decode(m.content).getOrElse(FakeCodec.decode(m.content))
          case "audio" => WavCodec.decode(m.content).getOrElse(FakeCodec.decode(m.content))
          case _ =>
            AviCodec.decode(m.content)
              .map(v => v.frames.indices.toArray
                .flatMap(i => AviCodec.frameLuminance(v, i).getOrElse(Array.emptyByteArray)))
              .filter(_.nonEmpty)
              .getOrElse(FakeCodec.decode(m.content))
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

  /** Resize images (others pass through untouched). Decodable images
    * get a REAL bilinear resample via `Graphics2D` and re-encode as
    * PNG; unrecognized bytes keep the deterministic stub subsample.
    */
  def resizeImages(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.map {
      case m if m.media_type == "image" =>
        val src = try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.content)))
        catch { case scala.util.control.NonFatal(_) => None }
        src match {
          case Some(img) =>
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            m.copy(content = pngBytes(out), meta = m.meta.copy(width = w, height = h))
          case None =>
            val (c, meta) = FakeCodec.resize(m.content, m.meta, w, h)
            m.copy(content = c, meta = meta)
        }
      case m => m
    }
  }

  /** Frame sampling: one row per `everyMs` of duration — the explode
    * shape a video pipeline needs. Decodable AVI content yields the
    * REAL frame nearest each sample instant (its encoded bytes, e.g. a
    * standalone JPEG for MJPEG streams); unrecognized bytes carve
    * deterministic stub chunks. Sample count is `max(1,
    * durationMs/everyMs)` for both paths.
    */
  def sampleFrames(items: Dataset[MediaItem], everyMs: Long = 1000L): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.filter(_.media_type == "video").flatMap { m =>
      val nSamples = math.max(1, (m.meta.durationMs / everyMs).toInt)
      AviCodec.decode(m.content) match {
        case Some(v) =>
          (0 until nSamples).iterator.map { i =>
            val idx = math.min(v.frames.length - 1L,
              i.toLong * everyMs * 1000L / v.microSecPerFrame).toInt
            Frame(m.media_id, idx, i * everyMs, v.frames(idx)._2)
          }
        case None =>
          val chunk = math.max(1, m.content.length / nSamples)
          (0 until nSamples).iterator.map { i =>
            val start = math.min(i * chunk, m.content.length - 1)
            val end = math.min(start + chunk, m.content.length)
            Frame(m.media_id, i, i * everyMs, m.content.slice(start, end))
          }
      }
    }
  }

  /** One row of exact decode evidence for the q54 sidecar oracle. */
  final case class MediaStats(media_id: Long, media_type: String, width: Long,
      height: Long, duration_ms: Long, n_units: Long, lum_sum: Long, lum_hash: Long)

  /** The committed ground-truth fixture (media.parquet + truth.parquet,
    * authored by tools/make_media_fixtures.py with zero shared code
    * with these decoders). Resolved relative to the launch dir with the
    * repo-root fallback so Verify and the driver agree on the path.
    */
  def fixtureDir: String = {
    val rel = new java.io.File("fixtures/media")
    if (rel.isDirectory) rel.getAbsolutePath else "/root/repo/fixtures/media"
  }

  /** Decode each media item for REAL and reduce the decoded stream to
    * exact integer digests a SQL engine can compare against authored
    * truth: dimensions, duration, unit count, luminance sum, and a
    * 31-rolling 64-bit hash of the full decoded byte sequence (one
    * wrong byte anywhere flips it). All fixture containers (PNG, BMP,
    * WAV/PCM, AVI/DIB) are lossless, so equality is exact — this is
    * what converts q54 from rows-only to a hash-checked oracle row.
    * Undecodable bytes produce all-zero digests, which can never match
    * an authored truth row — corruption FAILS the gate rather than
    * degrading silently.
    */
  def decodeStats(media: DataFrame): Dataset[MediaStats] = {
    import media.sparkSession.implicits._
    media.select(col("media_id").cast("long"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, tp, content) =>
          val none = (0L, 0L, 0L, Array.emptyByteArray)
          val (w, h, dur, lums) = tp match {
            case "image" =>
              ImageIoCodec.decodeDims(content)
                .map { case (iw, ih, px) => (iw.toLong, ih.toLong, 0L, px) }
                .getOrElse(none)
            case "audio" =>
              WavCodec.decodeWithRate(content)
                .map { case (rate, sm) =>
                  (0L, 0L, sm.length.toLong * 1000L / rate, sm)
                }
                .getOrElse(none)
            case _ =>
              AviCodec.decode(content).map { v =>
                val px = v.frames.indices.toArray
                  .flatMap(i => AviCodec.frameLuminance(v, i).getOrElse(Array.emptyByteArray))
                (v.width.toLong, v.height.toLong, v.durationMs, px)
              }.getOrElse(none)
          }
          var hsh = 1L
          var sum = 0L
          var i = 0
          while (i < lums.length) {
            val v = lums(i) & 0xff
            sum += v
            hsh = hsh * 31 + v
            i += 1
          }
          MediaStats(id, tp, w, h, dur, lums.length.toLong, sum, hsh)
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
