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

  test("table shape round-trips through parquet with binary column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    Multimodal.asTable(corpus).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("content").dataType.typeName === "binary")
    assert(back.count() === 200)
  }
}
