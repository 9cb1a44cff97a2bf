package graft.operators

/** Optional FFmpeg-backed [[MediaDecoder]] (r16 VERDICT #7) — the real
  * codec stack the seam was built for, bound through the `ffmpeg` CLI
  * (no JNI, no added dependency): each decode shells one bounded
  * `ffmpeg` process that reads the payload from a temp file and emits
  * raw gray pixels / mono PCM on stdout, which featurize exactly like
  * the JDK paths (fixed `dim` width, deterministic, never throws).
  *
  * Env-gated twice, deliberately:
  *  - [[available]] is false when no binary resolves
  *    (`GRAFT_FFMPEG_BIN` or `ffmpeg` on PATH) — every decode then
  *    defers (null) and MediaDecoderConformanceSpec skips its section
  *    cleanly;
  *  - [[Multimodal.DecoderChain]] only PREPENDS this decoder when
  *    `GRAFT_FFMPEG=1` is set, because an engaged FFmpeg decoder
  *    CHANGES feature values for payloads the JDK also decodes (each
  *    implementation featurizes with its own pixel path), which would
  *    shift the media queries' oracle-pinned outputs. Opt-in is a
  *    deployment decision, never a driver-run surprise.
  *
  * Contract compliance (the conformance kit pins it when a binary is
  * present): non-null outputs are exactly `dim` wide; corrupt/empty/
  * null payloads defer rather than throw (a failed ffmpeg exit is a
  * defer); decodes are pure — same bytes, same output — because the
  * invocations are flag-fixed and seedless.
  */
object FfmpegMediaDecoder extends MediaDecoder {
  val name = "ffmpeg"

  /** Resolved binary: GRAFT_FFMPEG_BIN override, else `ffmpeg` on PATH;
    * None when neither answers a `-version` probe. */
  lazy val binary: Option[String] = {
    val candidates = sys.env.get("GRAFT_FFMPEG_BIN").toSeq ++ Seq("ffmpeg")
    candidates.find { bin =>
      try {
        val p = new ProcessBuilder(bin, "-version")
          .redirectErrorStream(true).start()
        p.getInputStream.readAllBytes()
        p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS) && p.exitValue() == 0
      } catch { case _: Throwable => false }
    }
  }

  def available: Boolean = binary.isDefined

  /** Run ffmpeg over `payload` with `args` (input/output flags added
    * here), returning stdout bytes or null on any failure — absent
    * binary, non-zero exit, timeout, empty output. The payload rides a
    * temp file (AVI and friends need seekable input for their index),
    * deleted in finally. */
  private def run(payload: Array[Byte], args: Seq[String]): Array[Byte] = {
    if (payload == null || payload.isEmpty) return null
    val bin = binary.getOrElse(return null)
    var tmp: java.nio.file.Path = null
    try {
      tmp = java.nio.file.Files.createTempFile("graft_ffmpeg", ".bin")
      java.nio.file.Files.write(tmp, payload)
      val cmd = Seq(bin, "-nostdin", "-v", "error", "-i", tmp.toString) ++
        args ++ Seq("pipe:1")
      val p = new ProcessBuilder(cmd: _*).start()
      // drain stderr concurrently so a chatty decode can't deadlock
      val errDrain = new Thread(() => {
        try { val in = p.getErrorStream; val buf = new Array[Byte](8192)
          while (in.read(buf) >= 0) () } catch { case _: Throwable => () }
      })
      errDrain.setDaemon(true); errDrain.start()
      val out = p.getInputStream.readAllBytes()
      val done = p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) { p.destroyForcibly(); null }
      else if (p.exitValue() != 0 || out.isEmpty) null
      else out
    } catch { case _: Throwable => null }
    finally {
      if (tmp != null)
        try java.nio.file.Files.deleteIfExists(tmp)
        catch { case _: Throwable => () }
    }
  }

  /** Grid side for a dim-wide gray raster (the JdkMediaDecoder video
    * convention): the largest g ≤ 8 with g² ≤ dim. */
  private def grid(dim: Int): Int =
    math.max(1, math.min(math.sqrt(dim.toDouble).toInt, 8))

  /** Pack a raw gray raster (g² bytes/frame) into a dim-wide [0,1]
    * feature vector; trailing features stay 0 when g² < dim. */
  private def grayToFeatures(gray: Array[Byte], off: Int, g: Int, dim: Int): Array[Float] = {
    val f = new Array[Float](dim)
    var i = 0
    while (i < g * g && i < dim && off + i < gray.length) {
      f(i) = (gray(off + i) & 0xFF) / 255f
      i += 1
    }
    f
  }

  override def imageFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val g = grid(dim)
    val out = run(payload, Seq("-frames:v", "1",
      "-vf", s"scale=$g:$g", "-pix_fmt", "gray", "-f", "rawvideo"))
    if (out == null || out.length < g * g) null
    else grayToFeatures(out, 0, g, dim)
  }

  override def audioFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    // mono 8 kHz s16le, then mean |amplitude| per of dim equal buckets —
    // deterministic and sample-rate-normalized
    val out = run(payload, Seq("-ac", "1", "-ar", "8000", "-f", "s16le"))
    if (out == null || out.length < 2) return null
    val n = out.length / 2
    val f = new Array[Float](dim)
    val counts = new Array[Int](dim)
    var i = 0
    while (i < n) {
      val s = ((out(2 * i + 1) << 8) | (out(2 * i) & 0xFF)).toShort
      val b = math.min(dim - 1, (i.toLong * dim / n).toInt)
      f(b) += math.abs(s.toInt) / 32768f
      counts(b) += 1
      i += 1
    }
    var b = 0
    while (b < dim) { if (counts(b) > 0) f(b) /= counts(b); b += 1 }
    f
  }

  override def videoFrames(payload: Array[Byte], maxFrames: Int, dim: Int): Array[Array[Float]] = {
    val g = grid(dim)
    val out = run(payload, Seq("-frames:v", maxFrames.toString,
      "-vf", s"scale=$g:$g", "-pix_fmt", "gray", "-f", "rawvideo"))
    if (out == null || out.length < g * g) return null
    val frameBytes = g * g
    val nFrames = math.min(maxFrames, out.length / frameBytes)
    if (nFrames == 0) return null
    Array.tabulate(nFrames)(k => grayToFeatures(out, k * frameBytes, g, dim))
  }
}
