package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media
  * (image/audio/video) carried as opaque `binary` columns with typed
  * metadata, processed via `mapPartitions` so per-partition batch shape
  * and decoder reuse are explicit.
  *
  * Container-header metadata (PNG/JPEG/GIF dimensions + mime) is REAL
  * byte parsing (`imageMeta`); image pixel DECODE is REAL
  * (`decodeImage`/`resizeImage` via the JDK's built-in `javax.imageio`
  * PNG/JPEG/GIF/BMP readers, grid-pooled luminance features); and
  * uncompressed AUDIO decode is REAL (`decodeAudio`/`audioFeatures`
  * via the JDK's built-in `javax.sound.sampled` WAV/AIFF/AU PCM
  * readers — RMS energy-envelope features). VIDEO container demux is
  * REAL for uncompressed AVI (`videoMeta`/`sampleAviFrames` — RIFF
  * tree walk, BITMAPINFOHEADER, 24-bit DIB frame chunks with
  * bottom-up rows and 4-byte stride, sampled every k-th frame). Only
  * COMPRESSED codecs — the JDK genuinely ships none (h264/vp9,
  * mp3/ogg) — remain a deterministic fake (`decodeStub`/
  * `frameSampleStub`), and unrecognized payloads fall back to the same
  * fake, so the pipeline never throws on corrupt media. The decode
  * entry points route through the TYPED [[MediaDecoder]] seam
  * ([[DecoderChain]]): swapping in a real codec stack (JNI/FFmpeg) is
  * prepending a decoder that passes MediaDecoderConformanceSpec — no
  * plumbing changes, and the claim is contract-pinned, not a comment.
  *
  * Scale notes: binary payloads stay columnar in parquet and are never
  * collected; per-partition batches bound memory (`batchSize` rows at a
  * time); feature extraction emits fixed-width vectors so downstream
  * similarity/dedup operators (graft.queries.Similarity) apply
  * unchanged to media embeddings.
  */
object Multimodal {

  /** Decode preference order — the codec seam (see [[MediaDecoder]]):
    * real JDK codecs first, deterministic fakes as the terminal floor.
    * The FFmpeg CLI binding ([[FfmpegMediaDecoder]]) prepends itself
    * ONLY under the double gate `GRAFT_FFMPEG=1` + a resolvable binary:
    * an engaged FFmpeg decoder changes feature values for payloads the
    * JDK also decodes (each implementation featurizes through its own
    * pixel path), which would shift oracle-pinned media outputs — so
    * engaging it is an explicit deployment decision.
    * MediaDecoderConformanceSpec is the contract every entry passes. */
  val DecoderChain: Seq[MediaDecoder] =
    (if (sys.env.get("GRAFT_FFMPEG").contains("1") && FfmpegMediaDecoder.available)
       Seq(FfmpegMediaDecoder)
     else Seq.empty) ++ Seq(JdkMediaDecoder, StubMediaDecoder)

  /** Canonical media-row schema: payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate", IntegerType))))))

  final case class DecodedMedia(
      mediaId: Long, modality: String, frames: Int, featureDim: Int,
      features: Array[Float])

  final case class ImageMeta(mime: String, width: Int, height: Int)

  /** REAL container-header probe — no codec needed, just the public
    * byte layouts: PNG's IHDR chunk (big-endian w/h at offsets 16/20
    * after the 8-byte signature), JPEG's SOFn frame header (height then
    * width, big-endian, after marker + length + precision), GIF's
    * logical screen descriptor (little-endian w/h at offsets 6/8).
    * Returns null for unrecognized/truncated payloads. This is the part
    * of the multimodal path that is NOT stubbed: dimension/mime
    * metadata extraction runs on real bytes at scan speed, which is
    * what resolution-based filtering and resize planning need — full
    * pixel decode (the stub below) is only required for feature
    * extraction. */
  def imageMeta(payload: Array[Byte]): ImageMeta = {
    if (payload == null) return null
    def u8(i: Int): Int = java.lang.Byte.toUnsignedInt(payload(i))
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (be16(i) << 16) | be16(i + 2)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    // PNG: 89 50 4E 47 0D 0A 1A 0A + len + "IHDR" + w(4) + h(4)
    if (payload.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G')
      return ImageMeta("image/png", be32(16), be32(20))
    // GIF87a/GIF89a: "GIF8" + screen w/h little-endian at 6/8
    if (payload.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8')
      return ImageMeta("image/gif", le16(6), le16(8))
    // JPEG: SOI (FFD8), then marker segments; SOF0..SOF15 (except
    // DHT/DAC/RST) carry precision(1) + height(2) + width(2)
    if (payload.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 9 < payload.length && u8(i) == 0xFF) {
        val marker = u8(i + 1)
        if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) i += 2 // no length
        else {
          val len = be16(i + 2)
          if (len < 2) return null
          val isSof = marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) return ImageMeta("image/jpeg", be16(i + 7), be16(i + 5))
          i += 2 + len
        }
      }
    }
    null
  }

  final case class AudioMeta(mime: String, sampleRate: Int, channels: Int,
      durationMs: Long)

  /** REAL audio container-header probe, the WAV twin of [[imageMeta]]:
    * RIFF/WAVE chunk scan — "RIFF" + size + "WAVE", then chunks of
    * (fourcc, LE32 size); the "fmt " chunk carries channels (LE16 @+2),
    * sample rate (LE32 @+4) and block align (LE16 @+12), and the
    * "data" chunk's declared size gives the frame count, so
    * durationMs = floor(frames · 1000 / rate) — integer arithmetic,
    * bit-identical to any other engine computing the same floor.
    * Chunks are scanned generically (LIST/fact/cue chunks skip
    * cleanly), PCM or not. Returns null for unrecognized/truncated
    * payloads, like [[imageMeta]]. */
  def audioMeta(payload: Array[Byte]): AudioMeta = {
    if (payload == null || payload.length < 44) return null
    def u8(i: Int): Int = java.lang.Byte.toUnsignedInt(payload(i))
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = le16(i).toLong | (le16(i + 2).toLong << 16)
    def four(i: Int): String = new String(payload, i, 4, "US-ASCII")
    if (four(0) != "RIFF" || four(8) != "WAVE") return null
    var rate = 0; var channels = 0; var blockAlign = 0; var dataSize = -1L
    var i = 12
    var done = false
    while (!done && i + 8 <= payload.length) {
      val id = four(i)
      val sz = le32(i + 4)
      if (id == "fmt " && i + 8 + 16 <= payload.length) {
        channels = le16(i + 10)
        rate = le32(i + 12).toInt
        blockAlign = le16(i + 20)
      } else if (id == "data") {
        dataSize = sz // declared size is authoritative even if the
        // payload truncates the samples — this is a header probe
      }
      // a declared size past the buffer (header-only / truncated file)
      // can't be skipped over — record what we have and stop
      if (sz < 0 || sz > payload.length.toLong) done = true
      else i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    if (rate <= 0 || blockAlign <= 0 || dataSize < 0) return null
    val frames = dataSize / blockAlign
    AudioMeta("audio/wav", rate, channels, frames * 1000L / rate)
  }

  final case class VideoMeta(mime: String, width: Int, height: Int,
      frames: Int, durationMs: Long)

  /** REAL video container-header probe, the AVI twin of [[audioMeta]]:
    * RIFF('AVI ') chunk scan recursing into LIST chunks until the
    * 'avih' main header, which carries µs-per-frame (LE32 @+0), total
    * frames (LE32 @+16) and width/height (LE32 @+32/+36), so
    * durationMs = frames · µsPerFrame / 1000 — integer arithmetic,
    * bit-identical across engines. Returns null for unrecognized or
    * truncated payloads. */
  def videoMeta(payload: Array[Byte]): VideoMeta = {
    if (payload == null || payload.length < 24) return null
    def u8(i: Int): Int = java.lang.Byte.toUnsignedInt(payload(i))
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = le16(i).toLong | (le16(i + 2).toLong << 16)
    def four(i: Int): String = new String(payload, i, 4, "US-ASCII")
    if (four(0) != "RIFF" || four(8) != "AVI ") return null
    var found: VideoMeta = null
    def walk(start: Int, end: Int): Unit = {
      var i = start
      while (found == null && i + 8 <= end) {
        val id = four(i)
        val sz = le32(i + 4)
        if (sz < 0 || i + 8 + sz > end) return // truncated — stop
        val body = i + 8
        if (id == "LIST" && sz >= 4) walk(body + 4, body + sz.toInt)
        else if (id == "avih" && sz >= 40) {
          val usPerFrame = le32(body)
          val frames = le32(body + 16)
          found = VideoMeta("video/avi", le32(body + 32).toInt, le32(body + 36).toInt,
            frames.toInt, frames * usPerFrame / 1000L)
        }
        i = body + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
    }
    walk(12, payload.length)
    found
  }

  /** REAL AVI demux + frame sampling — the non-stub video pixel path:
    * walks the RIFF tree to the strf BITMAPINFOHEADER (uncompressed
    * 24-bit DIB only — biCompression 0, biBitCount 24; anything else,
    * i.e. any real codec, returns null and callers fall back to
    * [[frameSampleStub]]), then iterates the LIST(movi) '##db'/'##dc'
    * frame chunks, keeps every `stride`-th frame, and pools each kept
    * frame's RED channel into a grid×grid array of integer sums —
    * honoring the DIB's bottom-up row order (positive biHeight; a
    * flipped reader diverges from the oracle because the fixture's
    * cell value depends on cy) and the 4-byte row stride. Exact
    * integers, so the per-frame fingerprints are bit-identical across
    * engines (the q194 discipline at frame grain). */
  def sampleAviFrames(payload: Array[Byte], stride: Int, grid: Int): Array[Array[Long]] = {
    if (payload == null || payload.length < 24) return null
    def u8(i: Int): Int = java.lang.Byte.toUnsignedInt(payload(i))
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = le16(i).toLong | (le16(i + 2).toLong << 16)
    def four(i: Int): String = new String(payload, i, 4, "US-ASCII")
    if (four(0) != "RIFF" || four(8) != "AVI ") return null
    var bw = 0; var bh = 0; var bits = 0; var comp = -1L
    var bad = false
    var frameIdx = 0
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    def poolFrame(off: Int, len: Int): Array[Long] = {
      if (comp != 0L || bits != 24 || bw <= 0 || bh == 0) { bad = true; return null }
      val h = math.abs(bh)
      val bottomUp = bh > 0
      val rowBytes = ((bw * 3 + 3) / 4) * 4
      if (len < rowBytes * h) { bad = true; return null }
      val cells = new Array[Long](grid * grid)
      var r = 0
      while (r < h) {
        val y = if (bottomUp) h - 1 - r else r
        val cy = math.min(grid - 1, y * grid / h)
        var x = 0
        while (x < bw) {
          val cx = math.min(grid - 1, x * grid / bw)
          cells(cy * grid + cx) += u8(off + r * rowBytes + x * 3 + 2) // RED
          x += 1
        }
        r += 1
      }
      cells
    }
    def isFrameId(id: String): Boolean =
      id.length == 4 && id.charAt(0).isDigit && id.charAt(1).isDigit &&
        (id.endsWith("db") || id.endsWith("dc"))
    def walk(start: Int, end: Int): Unit = {
      var i = start
      while (!bad && i + 8 <= end) {
        val id = four(i)
        val sz = le32(i + 4)
        if (sz < 0 || i + 8 + sz > end) return // truncated — keep what parsed
        val body = i + 8
        if (id == "LIST" && sz >= 4) walk(body + 4, body + sz.toInt)
        else if (id == "strf" && sz >= 40 && bits == 0) {
          // first video strf wins (single-stream fixture; a multi-stream
          // demux would key this off the matching strh fccType)
          bw = le32(body + 4).toInt
          bh = le32(body + 8).toInt
          bits = le16(body + 14)
          comp = le32(body + 16)
        } else if (isFrameId(id)) {
          if (frameIdx % stride == 0) {
            val cells = poolFrame(body, sz.toInt)
            if (cells != null) frames += cells
          }
          frameIdx += 1
        }
        i = body + sz.toInt + (sz.toInt & 1)
      }
    }
    walk(12, payload.length)
    if (bad || frames.isEmpty) null else frames.toArray
  }

  /** Column-level metadata probe: fills the MediaSchema `meta` width/
    * height from real payload bytes for image rows (map-only, binary
    * never leaves its row). */
  def withImageMeta(media: DataFrame): DataFrame = {
    val probe = udf((p: Array[Byte]) => Option(imageMeta(p)))
    media.withColumn("probed", probe(col("payload")))
      .withColumn("mime", coalesce(col("probed.mime"), col("mime")))
      .withColumn("meta", struct(
        col("probed.width").as("width"),
        col("probed.height").as("height"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.sample_rate").as("sample_rate")))
      .drop("probed")
  }

  /** REAL pixel decode via the JDK's built-in ImageIO readers — PNG,
    * JPEG, GIF, and BMP decoders ship with every JRE, so this needs no
    * external codec. Returns null when no reader recognizes the payload
    * (corrupt/truncated media, or a format the JRE lacks), in which case
    * callers fall back to the deterministic byte-histogram fake so the
    * pipeline keeps flowing instead of throwing mid-job. */
  def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    if (payload == null) null
    else try {
      MediaCodecs.init() // memory-cached streams (disk cache = a temp
      // file per decode: 16x superlinear on the 10x curve, pre-fix)
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    } catch { case _: Throwable => null }

  /** REAL image features from decoded pixels: grid-pooled mean
    * luminance. The image is divided into a g×g cell grid
    * (g = ⌊√dim⌋) and each cell averages the Rec.601 luma of its
    * pixels — a fixed-width, resolution-independent signature suitable
    * for the downstream similarity/dedup operators. Cells beyond g²
    * stay 0 so the output is always exactly `dim` wide. */
  def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val g = math.max(1, math.sqrt(dim.toDouble).toInt)
    val feat = new Array[Float](dim)
    val counts = new Array[Int](dim)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      val cy = math.min(g - 1, y * g / h)
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000f / 255f
        val cell = cy * g + math.min(g - 1, x * g / w)
        feat(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < dim) { if (counts(i) > 0) feat(i) /= counts(i); i += 1 }
    feat
  }

  /** REAL audio decode via the JDK's built-in `javax.sound.sampled`
    * readers — WAV/AIFF/AU PCM decoders ship with every JRE (no codec
    * needed for uncompressed audio, which is also what a feature
    * pipeline normalizes to first). Returns null when no reader
    * recognizes the payload (mp3/ogg/corrupt), in which case callers
    * fall back to the deterministic fake. */
  def decodeAudio(payload: Array[Byte]): javax.sound.sampled.AudioInputStream =
    if (payload == null) null
    else try javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    catch { case _: Throwable => null }

  /** REAL audio features from decoded PCM: the stream is cut into
    * `dim` equal windows and each emits its RMS energy (mono-mixed,
    * normalized to [-1, 1]) — the standard first-stage energy envelope,
    * fixed-width and duration-independent like [[imageFeatures]].
    * Supports 8-bit (signed or unsigned) and 16-bit signed PCM, both
    * endiannesses. Returns null for anything else AudioSystem can read
    * but this decoder can't (24/32-bit, float PCM, µ-law/a-law) so the
    * caller falls back to the deterministic stub instead of silently
    * misreading 2 of N bytes per sample. */
  def audioFeatures(in: javax.sound.sampled.AudioInputStream, dim: Int): Array[Float] = {
    val fmt = in.getFormat
    val enc = fmt.getEncoding
    val pcmSigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
    val pcmUnsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
    val bits = fmt.getSampleSizeInBits
    if (!(pcmSigned || pcmUnsigned) || (bits != 8 && bits != 16) ||
        (bits == 16 && !pcmSigned)) return null
    val bytes = in.readAllBytes()
    val sampleBytes = math.max(1, fmt.getSampleSizeInBits / 8)
    val channels = math.max(1, fmt.getChannels)
    val frameBytes = sampleBytes * channels
    val nFrames = bytes.length / frameBytes
    val feat = new Array[Float](dim)
    if (nFrames == 0) return feat
    val sumSq = new Array[Double](dim)
    val counts = new Array[Int](dim)
    var f = 0
    while (f < nFrames) {
      var mixed = 0.0
      var ch = 0
      while (ch < channels) {
        val off = f * frameBytes + ch * sampleBytes
        val s =
          if (sampleBytes == 1) {
            // AIFF ships 8-bit PCM signed; WAV ships it unsigned.
            if (pcmSigned) bytes(off) / 128.0
            else (java.lang.Byte.toUnsignedInt(bytes(off)) - 128) / 128.0
          } else {
            val lo = bytes(off + (if (fmt.isBigEndian) 1 else 0))
            val hi = bytes(off + (if (fmt.isBigEndian) 0 else 1))
            ((hi << 8) | java.lang.Byte.toUnsignedInt(lo)) / 32768.0
          }
        mixed += s
        ch += 1
      }
      mixed /= channels
      val w = math.min(dim - 1, f * dim / nFrames)
      sumSq(w) += mixed * mixed
      counts(w) += 1
      f += 1
    }
    var i = 0
    while (i < dim) {
      if (counts(i) > 0) feat(i) = math.sqrt(sumSq(i) / counts(i)).toFloat
      i += 1
    }
    feat
  }

  /** Decode one media row to features through [[DecoderChain]]: real
    * pixel decode for images, real PCM energy envelope for
    * JRE-readable audio (WAV/AIFF/AU); the terminal deterministic
    * byte-histogram fake otherwise (video-as-single-vector — frame
    * features go through [[sampleFrames]] — plus mp3/ogg and corrupt
    * payloads). */
  def decodeFeatures(payload: Array[Byte], modality: String, dim: Int): Array[Float] = {
    val viaChain = modality match {
      case "image" =>
        DecoderChain.iterator.map(_.imageFeatures(payload, dim)).find(_ != null)
      case "audio" =>
        DecoderChain.iterator.map(_.audioFeatures(payload, dim)).find(_ != null)
      case _ => None // single-vector fallback for video/unknown rows
    }
    viaChain.getOrElse(decodeStub(payload, dim))
  }

  /** FAKE decoder for payloads without a JDK codec (audio/video, and
    * the fallback for unreadable images): deterministic byte histogram
    * projected to `dim`. Real implementation: decode →
    * resize/frame-sample → embed. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val feat = new Array[Float](dim)
    if (payload == null) return feat
    var i = 0
    while (i < payload.length) {
      feat(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1.0f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    var j = 0
    while (j < dim) { feat(j) /= n; j += 1 }
    feat
  }

  /** REAL image resize: decode via ImageIO, bilinear-scale to (w, h),
    * re-encode as PNG (the JDK PNG writer is lossless and always
    * available). Falls back to the deterministic size-proportional fake
    * when the payload isn't a readable image. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = decodeImage(payload)
    if (img == null) return resizeStub(payload, w, h)
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gfx = out.createGraphics()
    gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    gfx.drawImage(img, 0, 0, w, h, null)
    gfx.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    MediaCodecs.init() // the ENCODE side has its own stream cache
    javax.imageio.ImageIO.write(out, "png", baos)
    baos.toByteArray
  }

  /** FAKE resize for non-image payloads — keeps byte length
    * proportional to the target area so size-based planning downstream
    * stays meaningful. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (payload == null) return Array.empty
    val targetLen = math.max(1, math.min(payload.length, (w.toLong * h / 64).toInt))
    Array.tabulate[Byte](targetLen)(i => payload(i % payload.length))
  }

  /** STUB frame sampling for payloads [[sampleAviFrames]] can't demux
    * (compressed codecs, corrupt media). Deterministic fake: slice the
    * payload into `frames` chunks, one "frame" feature vector per
    * chunk. */
  def frameSampleStub(payload: Array[Byte], frames: Int, dim: Int): Array[Array[Float]] = {
    if (payload == null || payload.isEmpty) return Array.empty
    val chunk = math.max(1, payload.length / frames)
    Array.tabulate(math.min(frames, payload.length)) { f =>
      decodeStub(payload.slice(f * chunk, math.min((f + 1) * chunk, payload.length)), dim)
    }
  }

  final case class FrameFeatures(mediaId: Long, frameIdx: Int, features: Array[Float])

  /** Video path: one row per sampled frame — the explode-shaped output
    * that feeds frame-level dedup/similarity. Routed through
    * [[DecoderChain]]: uncompressed AVI goes through the REAL demux
    * ([[sampleAviFrames]] inside [[JdkMediaDecoder]]; grid sums
    * normalized into the first grid² feature slots); anything else
    * falls to the deterministic stub so the pipeline keeps flowing. */
  def sampleFrames(media: DataFrame, frames: Int = 8, dim: Int = 64): Dataset[FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("modality") === "video")
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val feats = DecoderChain.iterator
          .map(_.videoFrames(payload, frames, dim)).find(_ != null)
          .getOrElse(Array.empty[Array[Float]])
        feats.zipWithIndex.map { case (feat, i) => FrameFeatures(id, i, feat) }
      }
  }

  /** Partition-batched decode + feature extraction. The decoder handle
    * is created once per partition (≙ loading a codec/model once per
    * executor task, the expensive part in real pipelines) and rows are
    * processed in bounded batches.
    */
  def extractFeatures(media: DataFrame, dim: Int = 64, batchSize: Int = 128): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init happens here (ImageIO readers are
        // stateless statics; a JNI codec/model handle would be created
        // once per partition at this point)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, modality, payload) =>
            val frames = modality match {
              case "video" => 8 // frame-sampled (stub: fixed count)
              case _       => 1
            }
            DecodedMedia(id, modality, frames, dim, decodeFeatures(payload, modality, dim))
          }
        }
      }
  }

  /** Feature table ready for the similarity operators: embeddings as
    * array<double> + id, the exact shape graft.queries.Similarity
    * consumes. */
  def featureTable(media: DataFrame, dim: Int = 64): DataFrame =
    extractFeatures(media, dim).toDF()
      .select(col("mediaId").as("vec_id"),
        col("features").cast(ArrayType(DoubleType)).as("embedding"))
}
