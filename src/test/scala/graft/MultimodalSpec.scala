package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val corpus = Multimodal.synthesize(spark, 200).cache()

  test("synthesis is deterministic and covers all media types") {
    val again = Multimodal.synthesize(spark, 200)
    val a = corpus.collect().map(m => (m.media_id, m.content.toSeq)).toMap
    val b = again.collect().map(m => (m.media_id, m.content.toSeq)).toMap
    assert(a === b)
    val types = corpus.collect().map(_.media_type).toSet
    assert(types === Set("image", "audio", "video"))
  }

  test("feature extraction: schema, determinism, sane ranges") {
    val f = Multimodal.extractFeatures(corpus, dim = 16).cache()
    assert(f.count() === 200)
    val r = f.head()
    assert(r.embedding.length === 16)
    assert(r.mean_intensity >= 0.0 && r.mean_intensity <= 255.0)
    assert(r.byte_entropy >= 0.0 && r.byte_entropy <= 8.0)
    val f2 = Multimodal.extractFeatures(corpus, dim = 16)
    assert(f.join(f2.toDF("media_id", "mt2", "mi2", "be2", "emb2"), "media_id")
      .filter(col("mean_intensity") =!= col("mi2")).count() === 0)
  }

  test("resize only touches images and updates metadata") {
    val resized = Multimodal.resizeImages(corpus, 32, 32).cache()
    val images = resized.filter(_.media_type == "image").collect()
    assert(images.forall(m => m.meta.width === 32 && m.meta.height === 32))
    // synthesized images are real PNGs, so the resize is a real
    // resample: the output decodes to the requested dimensions
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(images.head.content))
    assert(back.getWidth === 32 && back.getHeight === 32)
    val audio0 = corpus.filter(_.media_type == "audio").head()
    val audio1 = resized.filter(_.media_type == "audio").head()
    assert(audio0.content.toSeq === audio1.content.toSeq)
  }

  test("frame sampling explodes videos by duration") {
    val frames = Multimodal.sampleFrames(corpus, everyMs = 1000L).cache()
    val videos = corpus.filter(_.media_type == "video").collect()
    val expected = videos.map(v => math.max(1, (v.meta.durationMs / 1000L).toInt).toLong).sum
    assert(frames.count() === expected)
    assert(frames.filter(_.frame_bytes.isEmpty).count() === 0)
  }

  test("ImageIoCodec decodes a real PNG to known luminance pixels") {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff) // white
    img.setRGB(1, 0, 0x000000) // black
    img.setRGB(0, 1, 0xff0000) // red
    img.setRGB(1, 1, 0x808080) // mid gray
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray
    // BT.601 integer luminance, row-major: 255, 0, 76 (255·299/1000), 128
    val px = Multimodal.ImageIoCodec.decode(bytes).get
    assert(px.map(_ & 0xff).toSeq === Seq(255, 0, 76, 128))
    // the real decoder feeds extractFeatures for decodable images: the
    // mean is the luminance mean, not a raw-byte-stream statistic
    import spark.implicits._
    val item = Multimodal.MediaItem(7L, "image", bytes, Multimodal.MediaMeta(2, 2, 0L, "png"))
    val feats = Multimodal.extractFeatures(Seq(item).toDS()).collect()
    assert(feats.head.mean_intensity === (255 + 0 + 76 + 128) / 4.0)
    // non-image bytes fall back to the stub instead of throwing
    assert(Multimodal.ImageIoCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("WavCodec decodes a real PCM WAV to known 8-bit samples") {
    // 4 mono 16-bit signed little-endian samples with known top bytes:
    // 0 → 128 after re-bias, 0x7F00 → 255, -32768 (0x8000) → 0,
    // 0x4000 → 192
    val samples = Array[Short](0, 0x7f00, Short.MinValue, 0x4000)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val bytes = bos.toByteArray
    val out = Multimodal.WavCodec.decode(bytes).get
    assert(out.map(_ & 0xff).toSeq === Seq(128, 255, 0, 192))
    // the real decoder feeds extractFeatures for decodable audio
    import spark.implicits._
    val item = Multimodal.MediaItem(9L, "audio", bytes, Multimodal.MediaMeta(0, 0, 1L, "wav"))
    val feats = Multimodal.extractFeatures(Seq(item).toDS()).collect()
    assert(feats.head.mean_intensity === (128 + 255 + 0 + 192) / 4.0)
    // non-audio bytes fall back to the stub instead of throwing
    assert(Multimodal.WavCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("AviCodec decodes an uncompressed DIB AVI to exact luminance frames") {
    // two 2×2 frames of known BGR pixels; DIB rows are bottom-up and
    // padded to a 4-byte stride (2 px × 3 B = 6 B → stride 8)
    def dibFrame(topRow: Seq[(Int, Int, Int)], botRow: Seq[(Int, Int, Int)]): Array[Byte] = {
      def row(px: Seq[(Int, Int, Int)]): Array[Byte] =
        px.flatMap { case (r, g, b) => Seq(b.toByte, g.toByte, r.toByte) }.toArray ++
          Array[Byte](0, 0)
      row(botRow) ++ row(topRow) // bottom-up storage
    }
    val f0 = dibFrame(Seq((255, 255, 255), (0, 0, 0)), Seq((255, 0, 0), (128, 128, 128)))
    val f1 = dibFrame(Seq((0, 255, 0), (0, 0, 255)), Seq((0, 0, 0), (255, 255, 255)))
    val avi = Multimodal.AviCodec.encode(2, 2, 5, Seq(f0, f1), mjpeg = false)
    val v = Multimodal.AviCodec.decode(avi).get
    assert(v.width === 2 && v.height === 2)
    assert(v.microSecPerFrame === 200000L)
    assert(v.frames.length === 2)
    assert(v.durationMs === 400L)
    // BT.601 integer luminance, row-major top-down: matches ImageIoCodec's law
    assert(Multimodal.AviCodec.frameLuminance(v, 0).get.map(_ & 0xff).toSeq
      === Seq(255, 0, 76, 128))
    assert(Multimodal.AviCodec.frameLuminance(v, 1).get.map(_ & 0xff).toSeq
      === Seq(587 * 255 / 1000, 114 * 255 / 1000, 0, 255))
    // non-AVI bytes degrade to None, never throw
    assert(Multimodal.AviCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.AviCodec.decode("RIFF????junk".getBytes).isEmpty)
  }

  test("AviCodec round-trips MJPEG frames through the real JPEG decoder") {
    def solid(rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgb)
      img
    }
    def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = Multimodal.AviCodec.encode(16, 16, 5,
      Seq(jpeg(solid(0xffffff)), jpeg(solid(0x000000)), jpeg(solid(0x808080))), mjpeg = true)
    val v = Multimodal.AviCodec.decode(avi).get
    assert(v.frames.length === 3)
    // JPEG is lossy — solid frames decode to within quantization error
    val means = (0 until 3).map { i =>
      val px = Multimodal.AviCodec.frameLuminance(v, i).get
      px.map(_ & 0xff).sum.toDouble / px.length
    }
    assert(math.abs(means(0) - 255.0) < 3.0)
    assert(math.abs(means(1) - 0.0) < 3.0)
    assert(math.abs(means(2) - 128.0) < 3.0)
  }

  test("sampled frames from synthesized video are real standalone JPEGs") {
    val frames = Multimodal.sampleFrames(corpus, everyMs = 1000L).collect()
    assert(frames.nonEmpty)
    // every sampled frame starts with the JPEG SOI marker and decodes
    // through ImageIO at the synthesized 16×16 frame size
    assert(frames.forall(f =>
      (f.frame_bytes(0) & 0xff) == 0xff && (f.frame_bytes(1) & 0xff) == 0xd8))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frames.head.frame_bytes))
    assert(img.getWidth === 16 && img.getHeight === 16)
    // and extractFeatures on video rows uses decoded luminance: a video
    // of solid black frames must have mean 0-ish, not a byte-stream stat
    import spark.implicits._
    def jpeg(rgb: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) im.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    val black = Multimodal.AviCodec.encode(16, 16, 5, Seq(jpeg(0), jpeg(0)), mjpeg = true)
    val item = Multimodal.MediaItem(11L, "video", black, Multimodal.MediaMeta(16, 16, 400L, "avi-mjpg"))
    val feats = Multimodal.extractFeatures(Seq(item).toDS()).collect()
    assert(feats.head.mean_intensity < 3.0)
  }

  test("table shape round-trips through parquet with binary column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    Multimodal.asTable(corpus).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("content").dataType.typeName === "binary")
    assert(back.count() === 200)
  }

  test("decodeStats reproduces the authored truth sidecar byte-exactly") {
    // the committed fixture was authored by pure-Python encoders
    // (tools/make_media_fixtures.py) with expected digests computed
    // from the CHOSEN pixels/samples, never by decoding — agreement
    // here proves the JDK decode path end-to-end on all four formats
    val fix = Multimodal.fixtureDir
    val cols = Seq("media_id", "media_type", "width", "height",
      "duration_ms", "n_units", "lum_sum", "lum_hash")
    val got = Multimodal.decodeStats(spark.read.parquet(s"$fix/media.parquet"))
      .toDF().select(cols.map(org.apache.spark.sql.functions.col): _*)
    val want = spark.read.parquet(s"$fix/truth.parquet")
      .select(cols.map(org.apache.spark.sql.functions.col): _*)
    assert(want.count() === 130) // 120 decodable + 10 authored-corrupt
    assert(got.exceptAll(want).isEmpty, "decoded stats not in truth")
    assert(want.exceptAll(got).isEmpty, "truth rows not reproduced")
  }
}
