package graft.operators

/** Deterministic synthetic MEDIA payloads derived from `doc_id` — the
  * derived-corpus discipline (q120/q165/q169's augmentation pattern,
  * q168's canonical-source carry) extended to binary columns: the test
  * corpus carries no media, so the fixture generator's closed-form
  * parameters double as the DuckDB oracle's arithmetic premise, and the
  * Spark side must recover the SAME numbers by PARSING THE BYTES
  * ([[Multimodal.imageMeta]] / [[Multimodal.audioMeta]] /
  * [[Multimodal.decodeImage]]). A fixture/parser disagreement —
  * misread IHDR offsets, wrong endianness, a broken chunk scan, a
  * lossy decode — surfaces as an oracle hash mismatch, which is
  * exactly what makes the media queries a real correctness gate rather
  * than a spec-only surface.
  *
  * All payloads are REAL container bytes (PNG signature + IHDR + IEND,
  * GIF89a logical screen descriptor, JPEG SOI + SOF0 frame header, a
  * complete RIFF/WAVE file with silent 16-bit PCM data); the q194
  * pattern images additionally round-trip the JDK's lossless PNG
  * encoder so pixel DECODE is exercised, not just header parsing.
  *
  * Closed-form parameters (the oracle recomputes these verbatim):
  *  - class  = doc_id % 4 → 0 PNG, 1 GIF, 2 JPEG, 3 WAV
  *  - corrupt: doc_id % 13 == 0 → payload truncated to 5 bytes
  *    (every parser must return null → census mime 'rejected')
  *  - images: width = 16 + doc_id % 97, height = 16 + doc_id % 61
  *  - audio : rate = 8000 + (doc_id % 5)·4000, mono 16-bit PCM,
  *            frames = 1000 + doc_id % 512,
  *            durationMs = floor(frames · 1000 / rate)
  *  - q194 pattern: 32×32 grayscale, 4×4 grid of 8×8 blocks,
  *    v(cx,cy) = (p·31 + cx·4 + cy) mod 256 with p = doc_id % 37 —
  *    37 distinct patterns, so documents sharing p are exact
  *    feature-space duplicates (the media near-dup groups).
  */
object MediaFixture {

  val ImgWMod = 97
  val ImgHMod = 61
  val CorruptMod = 13
  val PatternMod = 37

  def width(docId: Long): Int = (16 + docId % ImgWMod).toInt
  def height(docId: Long): Int = (16 + docId % ImgHMod).toInt
  def sampleRate(docId: Long): Int = (8000 + (docId % 5) * 4000).toInt
  def frames(docId: Long): Int = (1000 + docId % 512).toInt
  def corrupt(docId: Long): Boolean = docId % CorruptMod == 0

  /** The q193 census payload for a document: PNG/GIF/JPEG/WAV by
    * doc_id class, truncated to 5 bytes for the corrupt class. */
  def payload(docId: Long): Array[Byte] = {
    val full = (docId % 4) match {
      case 0 => png(width(docId), height(docId))
      case 1 => gif(width(docId), height(docId))
      case 2 => jpeg(width(docId), height(docId))
      case _ => wav(sampleRate(docId), frames(docId))
    }
    if (corrupt(docId)) full.take(5) else full
  }

  /** Declared modality (generator intent — what an ingest manifest
    * would carry; the PARSED mime may disagree, e.g. 'rejected'). */
  def modality(docId: Long): String =
    if (docId % 4 == 3) "audio" else "image"

  // -- container writers --------------------------------------------------

  private def be32(v: Int): Array[Byte] =
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] =
    Array[Byte]((v >>> 8).toByte, v.toByte)
  private def le32(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >>> 8).toByte)

  /** Header-grain PNG: signature + IHDR(w, h, 8-bit truecolor) + IEND.
    * No IDAT — [[Multimodal.imageMeta]] reads the IHDR offsets; the
    * pixel-decodable fixture is [[patternPng]]. CRCs are zeroed (the
    * header probe does not checksum; ImageIO would reject, which is
    * fine — this class of payload is for metadata-grain queries). */
  def png(w: Int, h: Int): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    val ihdr = be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
    val iend = be32(0) ++ "IEND".getBytes("US-ASCII") ++ be32(0)
    sig ++ ihdr ++ iend
  }

  /** GIF89a logical screen descriptor + trailer. */
  def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
      Array[Byte](0, 0, 0, 0x3B)

  /** JPEG SOI + SOF0 baseline frame header (precision 8, 3 components)
    * + EOI — the segment [[Multimodal.imageMeta]]'s marker walk stops
    * at. */
  def jpeg(w: Int, h: Int): Array[Byte] =
    Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xC0.toByte) ++
      be16(17) ++ Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1,
        0xFF.toByte, 0xD9.toByte)

  /** A COMPLETE valid RIFF/WAVE file: fmt chunk (PCM, mono, 16-bit at
    * `rate`) + data chunk with `frames` silent samples — readable by
    * `javax.sound.sampled` end to end, not just header-shaped. */
  def wav(rate: Int, frames: Int): Array[Byte] = {
    val blockAlign = 2 // mono 16-bit
    val dataSize = frames * blockAlign
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(rate) ++ le32(rate * blockAlign) ++
      le16(blockAlign) ++ le16(16)
    val data = "data".getBytes("US-ASCII") ++ le32(dataSize) ++
      new Array[Byte](dataSize)
    val riffSize = 4 + fmt.length + data.length
    "RIFF".getBytes("US-ASCII") ++ le32(riffSize) ++
      "WAVE".getBytes("US-ASCII") ++ fmt ++ data
  }

  // -- q197: PCM-decodable audio with closed-form samples -------------------

  val PcmRate = 16000
  val PcmFrames = 2048
  val PcmWindows = 8

  /** Closed-form signed 16-bit sample i of document docId — the audio
    * twin of [[cellValue]]: the oracle recomputes it arithmetically,
    * the engine must recover it through the JDK's actual WAV decoder. */
  def pcmSample(docId: Long, i: Int): Int =
    (((docId * 7919 + i.toLong * 31) % 65536) - 32768).toInt

  /** A complete valid mono 16-bit PCM WAV whose samples are
    * [[pcmSample]] — decodable end-to-end by `javax.sound.sampled`. */
  def pcmWav(docId: Long): Array[Byte] = {
    val blockAlign = 2
    val dataSize = PcmFrames * blockAlign
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(PcmRate) ++ le32(PcmRate * blockAlign) ++
      le16(blockAlign) ++ le16(16)
    val data = new Array[Byte](dataSize)
    var i = 0
    while (i < PcmFrames) {
      val v = pcmSample(docId, i)
      data(2 * i) = v.toByte
      data(2 * i + 1) = (v >> 8).toByte
      i += 1
    }
    val dataChunk = "data".getBytes("US-ASCII") ++ le32(dataSize) ++ data
    val riffSize = 4 + fmt.length + dataChunk.length
    "RIFF".getBytes("US-ASCII") ++ le32(riffSize) ++
      "WAVE".getBytes("US-ASCII") ++ fmt ++ dataChunk
  }

  /** Integer energy envelope from a REAL JDK audio decode: the payload
    * goes through `javax.sound.sampled` (container framing, format,
    * endianness all decoded by the JRE, not by this code), and each of
    * `windows` equal frame windows emits the SUM OF |sample| — exact
    * integers, so the envelope fingerprint is bit-identical across
    * engines (the float-RMS path [[Multimodal.audioFeatures]] serves
    * ANN; THIS is the dedup/census kernel). Only mono signed 16-bit
    * PCM is accepted (the fixture's format); anything else, or an
    * unreadable payload, returns null. */
  def pcmWindowSums(payload: Array[Byte], windows: Int): Array[Long] = {
    val in = Multimodal.decodeAudio(payload)
    if (in == null) return null
    val fmt = in.getFormat
    if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 16 ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
      return null
    val bytes = in.readAllBytes()
    val n = bytes.length / 2
    if (n == 0) return null
    val sums = new Array[Long](windows)
    var f = 0
    while (f < n) {
      val lo = bytes(2 * f + (if (fmt.isBigEndian) 1 else 0))
      val hi = bytes(2 * f + (if (fmt.isBigEndian) 0 else 1))
      val s = (hi << 8) | java.lang.Byte.toUnsignedInt(lo)
      sums(math.min(windows - 1, f * windows / n)) += math.abs(s)
      f += 1
    }
    sums
  }

  /** Per-sample quality statistics from a REAL JDK audio decode — the
    * q203 gate kernel (clipping / DC offset / low-energy windows, the
    * standard audio-curation checks). Same decode discipline as
    * [[pcmWindowSums]]: the payload goes through `javax.sound.sampled`
    * and only mono signed 16-bit PCM is accepted. Returns
    * `[nClip, maxAbs, sumSigned, nLowWindows, nSamples]` — all exact
    * integers so the census is bit-identical across engines — or null
    * when the payload doesn't decode. nSamples (the decoded sample
    * count) lets rate thresholds — e.g.
    * [[graft.streaming.StreamingMediaGate]]'s clip-rate cut — stay
    * duration-independent.
    *
    *  - nClip   = #samples with |s| >= clipAbs (clipping detector)
    *  - maxAbs  = max |s| (peak level)
    *  - sumSigned = Σ s (DC offset numerator, signed)
    *  - nLowWindows = #equal frame windows whose Σ|s| < lowThreshold
    */
  def pcmSampleStats(payload: Array[Byte], clipAbs: Int, windows: Int,
      lowThreshold: Long): Array[Long] = {
    val in = Multimodal.decodeAudio(payload)
    if (in == null) return null
    val fmt = in.getFormat
    if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 16 ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
      return null
    val bytes = in.readAllBytes()
    val n = bytes.length / 2
    if (n == 0) return null
    val winSums = new Array[Long](windows)
    var nClip = 0L; var maxAbs = 0L; var sumSigned = 0L
    var f = 0
    while (f < n) {
      val lo = bytes(2 * f + (if (fmt.isBigEndian) 1 else 0))
      val hi = bytes(2 * f + (if (fmt.isBigEndian) 0 else 1))
      val s = (hi << 8) | java.lang.Byte.toUnsignedInt(lo)
      val a = math.abs(s)
      if (a >= clipAbs) nClip += 1
      if (a > maxAbs) maxAbs = a
      sumSigned += s
      winSums(math.min(windows - 1, f * windows / n)) += a
      f += 1
    }
    Array(nClip, maxAbs, sumSigned, winSums.count(_ < lowThreshold).toLong, n.toLong)
  }

  // -- q198: demuxable uncompressed AVI video --------------------------------

  val VideoSize = 16     // 4x4 grid of 4x4-pixel solid blocks
  val VideoGrid = 4
  val VideoBlock = VideoSize / VideoGrid // 4 px; 16 px per block
  val VideoFpsUs = 100000 // 10 fps -> 100 ms per frame
  val FrameStride = 2     // q198 samples frames 0, 2, 4, ...

  def videoFrames(docId: Long): Int = (4 + docId % 5).toInt

  /** Closed-form BLUE channel of the 4×4 block at grid cell (cx, cy) of
    * frame `f` — the video twin of [[cellValue]]. The three channels are
    * deliberately DISTINCT (blue = v, green = v+1, red = v+2, mod 256)
    * and the pooling kernel reads only RED, so a BGR/RGB byte-order
    * misread in the DIB walk diverges from the oracle instead of
    * cancelling out on a gray image. */
  def videoCellValue(docId: Long, f: Int, cx: Int, cy: Int): Int =
    ((docId * 31 + f * 53 + cx * 4 + cy) % 256).toInt

  /** One uncompressed bottom-up 24-bit DIB frame (the AVI '00db'
    * payload): stored row r is image row h-1-r, pixels are B,G,R. Row
    * stride w·3 = 48 bytes is already 4-aligned for the fixture size. */
  private[operators] def aviFrame(docId: Long, f: Int): Array[Byte] = {
    val w = VideoSize; val h = VideoSize
    val out = new Array[Byte](w * 3 * h)
    var r = 0
    while (r < h) {
      val y = h - 1 - r // bottom-up storage
      val cy = y / VideoBlock
      var x = 0
      while (x < w) {
        val v = videoCellValue(docId, f, x / VideoBlock, cy)
        val o = r * w * 3 + x * 3
        out(o) = v.toByte
        out(o + 1) = ((v + 1) % 256).toByte
        out(o + 2) = ((v + 2) % 256).toByte
        x += 1
      }
      r += 1
    }
    out
  }

  /** A complete, spec-valid uncompressed AVI: RIFF('AVI ') containing
    * LIST(hdrl){ avih + LIST(strl){ strh('vids'/'DIB ') + strf(
    * BITMAPINFOHEADER, 24-bit, biCompression=0, positive biHeight =
    * bottom-up) } } + LIST(movi){ one '00db' DIB chunk per frame } —
    * the layout any real demuxer (ffmpeg, VfW) reads. Frame pixels are
    * [[videoCellValue]] closed form, so the DuckDB oracle recomputes
    * the pooled sums arithmetically while the engine must recover them
    * through [[Multimodal.sampleAviFrames]]'s actual chunk walk. */
  def avi(docId: Long): Array[Byte] = {
    val w = VideoSize; val h = VideoSize
    val nf = videoFrames(docId)
    val frameBytes = w * 3 * h
    def fourcc(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      fourcc(id) ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(typ) ++ body)
    val avih =
      le32(VideoFpsUs) ++ le32(frameBytes * 10) ++ le32(0) ++ le32(0) ++
        le32(nf) ++ le32(0) ++ le32(1) ++ le32(frameBytes) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh =
      fourcc("vids") ++ fourcc("DIB ") ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++ le32(nf) ++
        le32(frameBytes) ++ le32(-1) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = // BITMAPINFOHEADER
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        le32(0) ++ le32(frameBytes) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      (0 until nf).toArray.flatMap(f => chunk("00db", aviFrame(docId, f))))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** The q198 payload: full AVI, truncated to 5 bytes for the corrupt
    * class (every parser must reject → census mime 'rejected'). */
  def aviPayload(docId: Long): Array[Byte] = {
    val full = avi(docId)
    if (corrupt(docId)) full.take(5) else full
  }

  // -- q194: pixel-decodable pattern image ---------------------------------

  val PatternSize = 32 // 4x4 grid of 8x8 blocks
  val GridCells = 4

  /** Gray value of the 8×8 block at grid cell (cx, cy) for pattern p. */
  def cellValue(p: Long, cx: Int, cy: Int): Int =
    ((p * 31 + cx * 4 + cy) % 256).toInt

  /** A real, decodable 32×32 PNG via the JDK's lossless encoder: each
    * 8×8 block is the solid gray [[cellValue]] of its cell, pattern
    * p = doc_id % 37. Encoder byte output is never compared — only the
    * DECODED pixels are (encode→decode is exact for PNG), so encoder
    * version differences cannot break the oracle. */
  def patternPng(docId: Long): Array[Byte] = {
    val p = docId % PatternMod
    val img = new java.awt.image.BufferedImage(
      PatternSize, PatternSize, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < PatternSize) {
      var x = 0
      while (x < PatternSize) {
        val v = cellValue(p, x / 8, y / 8)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    // explicit codec init (r15 ADVICE): the fixture ENCODE can be the
    // first ImageIO touch in a fresh executor — it must not depend on
    // Multimodal's class-load order to get memory-cached streams
    MediaCodecs.init()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Integer grid-pooled features of a decoded image: the SUM of the
    * red channel over each 8×8 block, row-major by (cy, cx) — exact
    * integers, so the feature fingerprint is bit-identical across
    * engines (the float-luma path [[Multimodal.imageFeatures]] serves
    * ANN; THIS is the dedup fingerprint). Returns null when the
    * payload doesn't decode. */
  def gridSums(payload: Array[Byte]): Array[Long] = {
    val img = Multimodal.decodeImage(payload)
    if (img == null) return null
    val cells = new Array[Long](GridCells * GridCells)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      val cy = math.min(GridCells - 1, y * GridCells / h)
      var x = 0
      while (x < w) {
        val cx = math.min(GridCells - 1, x * GridCells / w)
        cells(cy * GridCells + cx) += (img.getRGB(x, y) >> 16) & 0xFF
        x += 1
      }
      y += 1
    }
    cells
  }
}
