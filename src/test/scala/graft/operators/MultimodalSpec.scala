package graft.operators

import graft.SparkSpecBase
import graft.functions.VectorFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def mediaDf = {
    val rows = (1L to 20L).map { i =>
      val payload = Array.tabulate[Byte](100 + i.toInt)(j => ((i * 31 + j) % 251).toByte)
      Row(i, if (i % 3 == 0) "video" else "image", "application/octet-stream", payload,
        Row(640, 480, if (i % 3 == 0) 5000L else null, null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Multimodal.MediaSchema)
  }

  test("binary payloads round-trip the media schema through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    mediaDf.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType.typeName == "binary")
    assert(back.count() == 20)
    val p = back.where(col("media_id") === 5).select("payload").head.getAs[Array[Byte]](0)
    assert(p.length == 105)
  }

  test("feature extraction is deterministic, batched, and fixed-width") {
    val feats = Multimodal.extractFeatures(mediaDf, dim = 16, batchSize = 4).collect()
    assert(feats.length == 20)
    assert(feats.forall(_.features.length == 16))
    assert(feats.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3)) // normalized histogram
    assert(feats.filter(_.modality == "video").forall(_.frames == 8))
    // determinism: same payload -> same features
    val again = Multimodal.extractFeatures(mediaDf, dim = 16, batchSize = 7).collect()
    assert(feats.sortBy(_.mediaId).zip(again.sortBy(_.mediaId))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("frame sampling explodes videos into per-frame feature rows") {
    val frames = Multimodal.sampleFrames(mediaDf, frames = 4, dim = 16).collect()
    val videoIds = (1L to 20L).filter(_ % 3 == 0)
    assert(frames.map(_.mediaId).distinct.sorted.toSeq == videoIds)
    assert(frames.groupBy(_.mediaId).values.forall(_.length == 4))
    assert(frames.forall(_.features.length == 16))
    // deterministic per frame index
    val again = Multimodal.sampleFrames(mediaDf, frames = 4, dim = 16).collect()
    assert(frames.sortBy(f => (f.mediaId, f.frameIdx)).zip(again.sortBy(f => (f.mediaId, f.frameIdx)))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("resize stub scales payload size with target area") {
    val payload = Array.tabulate[Byte](1000)(_.toByte)
    val small = Multimodal.resizeStub(payload, 64, 64)
    val large = Multimodal.resizeStub(payload, 640, 480)
    assert(small.length < large.length)
    assert(Multimodal.resizeStub(payload, 64, 64).sameElements(small))
  }

  test("feature table feeds the similarity operators unchanged") {
    val ft = Multimodal.featureTable(mediaDf, dim = 16)
    assert(ft.columns.toSeq == Seq("vec_id", "embedding"))
    val a = ft.select(col("vec_id").as("a_id"), col("embedding").as("a_v"))
    val b = ft.select(col("vec_id").as("b_id"), col("embedding").as("b_v"))
    val sims = a.join(b, col("a_id") < col("b_id"))
      .select(VectorFunctions.cosineSim(col("a_v"), col("b_v")).as("cos"))
      .collect().map(_.getDouble(0))
    assert(sims.nonEmpty && sims.forall(c => c >= -1.0001 && c <= 1.0001))
  }

  // ---- REAL pixel decode (JDK javax.imageio — no external codec) ----

  private def realPng(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("real PNG decodes to actual pixel values through the batched path") {
    // 8x8: left half black, right half white — the 4x4 luminance grid
    // must show ~0 in its left two columns and ~1 in its right two
    val png = realPng(8, 8)((x, _) => if (x < 4) 0x000000 else 0xFFFFFF)
    val rows = Seq(Row(1L, "image", "image/png", png, Row(null, null, null, null)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), Multimodal.MediaSchema)
    val feats = Multimodal.extractFeatures(df, dim = 16, batchSize = 4).collect()
    assert(feats.length == 1)
    val f = feats.head.features
    for (r <- 0 until 4) {
      assert(f(r * 4) < 0.01f && f(r * 4 + 1) < 0.01f, s"row $r left cells should be black: ${f.toSeq}")
      assert(f(r * 4 + 2) > 0.99f && f(r * 4 + 3) > 0.99f, s"row $r right cells should be white: ${f.toSeq}")
    }
    assert(feats.head.featureDim == 16)
    // decodeImage reports the true pixel dimensions
    val img = Multimodal.decodeImage(png)
    assert(img.getWidth == 8 && img.getHeight == 8)
    // and a JPEG re-encode of the same image decodes too (JDK JPEG reader)
    val jbaos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbaos)
    assert(Multimodal.decodeImage(jbaos.toByteArray) != null)
  }

  /** Real little-endian 16-bit PCM WAV via the JDK's own writer. */
  private def realWav(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      bytes(i * 2) = (samples(i) & 0xFF).toByte
      bytes(i * 2 + 1) = ((samples(i) >> 8) & 0xFF).toByte
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("real WAV decodes to the PCM energy envelope through the batched path") {
    // 1600 samples: first half a full-scale square wave (RMS = 1.0),
    // second half silence (RMS = 0) — the 4-window envelope must read
    // ~[1, 1, 0, 0]
    val samples = Array.tabulate[Short](1600)(i =>
      if (i < 800) (if (i % 2 == 0) 32767 else -32767).toShort else 0)
    val wav = realWav(samples)
    val rows = Seq(Row(7L, "audio", "audio/wav", wav, Row(null, null, null, null)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), Multimodal.MediaSchema)
    val f = Multimodal.extractFeatures(df, dim = 4, batchSize = 4).collect().head.features
    assert(f(0) > 0.95f && f(1) > 0.95f, s"loud windows should read ~1: ${f.toSeq}")
    assert(f(2) < 0.01f && f(3) < 0.01f, s"silent windows should read ~0: ${f.toSeq}")
    // decodeAudio reports the true format
    val in = Multimodal.decodeAudio(wav)
    assert(in != null && in.getFormat.getSampleRate == 8000f &&
      in.getFormat.getChannels == 1)
    // non-PCM junk falls back to the deterministic fake, not an exception
    val junk = Array.fill[Byte](64)(3)
    assert(Multimodal.decodeFeatures(junk, "audio", 4).toSeq ==
      Multimodal.decodeStub(junk, 4).toSeq)
  }

  test("real resize re-encodes to target dimensions; junk falls back to the fake") {
    val png = realPng(8, 8)((x, y) => if ((x + y) % 2 == 0) 0xFF0000 else 0x00FF00)
    val resized = Multimodal.resizeImage(png, 4, 4)
    val img = Multimodal.decodeImage(resized)
    assert(img != null && img.getWidth == 4 && img.getHeight == 4)
    assert(Multimodal.imageMeta(resized) == Multimodal.ImageMeta("image/png", 4, 4))
    val junk = Array.tabulate[Byte](100)(_.toByte)
    assert(Multimodal.resizeImage(junk, 4, 4).sameElements(Multimodal.resizeStub(junk, 4, 4)))
  }

  test("unreadable image payloads fall back to the deterministic histogram") {
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    assert(Multimodal.decodeImage(junk) == null)
    assert(Multimodal.decodeFeatures(junk, "image", 16)
      .sameElements(Multimodal.decodeStub(junk, 16)))
  }

  // ---- REAL header parsing (no codec involved) ----

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h)
    out.put(Array[Byte](8, 2, 0, 0, 0)).putInt(0)
    out.array()
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 18 + 2 + 11)
    out.put(Array(0xFF, 0xD8).map(_.toByte))                     // SOI
    out.put(Array(0xFF, 0xE0).map(_.toByte)).putShort(16)        // APP0 len 16
    out.put("JFIF".getBytes("US-ASCII")).put(Array.fill[Byte](10)(0))
    out.put(Array(0xFF, 0xC0).map(_.toByte)).putShort(11)        // SOF0 len 11
    out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)    // precision, H, W
    out.put(Array[Byte](3, 0))
    out.array()
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(w.toShort).putShort(h.toShort)
    out.put(Array[Byte](0, 0, 0))
    out.array()
  }

  test("imageMeta parses real PNG/JPEG/GIF headers, null on junk") {
    assert(Multimodal.imageMeta(pngBytes(1920, 1080)) == Multimodal.ImageMeta("image/png", 1920, 1080))
    assert(Multimodal.imageMeta(jpegBytes(800, 600)) == Multimodal.ImageMeta("image/jpeg", 800, 600))
    assert(Multimodal.imageMeta(gifBytes(320, 200)) == Multimodal.ImageMeta("image/gif", 320, 200))
    assert(Multimodal.imageMeta("not an image".getBytes) == null)
    assert(Multimodal.imageMeta(Array[Byte](0x89.toByte, 'P')) == null) // truncated
    assert(Multimodal.imageMeta(null) == null)
  }

  test("withImageMeta fills width/height/mime from payload bytes, map-only") {
    val rows = Seq(
      Row(1L, "image", "application/octet-stream", pngBytes(640, 480), Row(null, null, null, null)),
      Row(2L, "image", "application/octet-stream", jpegBytes(1024, 768), Row(null, null, null, null)),
      Row(3L, "audio", "audio/wav", Array[Byte](1, 2, 3), Row(null, null, 9000L, 44100)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.MediaSchema)
    val out = Multimodal.withImageMeta(df).orderBy("media_id")
      .select("media_id", "mime", "meta.width", "meta.height", "meta.duration_ms")
      .collect()
    assert(out(0).getString(1) == "image/png" && out(0).getInt(2) == 640 && out(0).getInt(3) == 480)
    assert(out(1).getString(1) == "image/jpeg" && out(1).getInt(2) == 1024 && out(1).getInt(3) == 768)
    // non-image rows keep their mime and audio metadata untouched
    assert(out(2).getString(1) == "audio/wav" && out(2).getLong(4) == 9000L)
    // plan is map-only: no exchange anywhere
    val plan = Multimodal.withImageMeta(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
