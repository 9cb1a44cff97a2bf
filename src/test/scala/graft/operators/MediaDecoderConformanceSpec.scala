package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The media-codec seam's contract suite (r15 VERDICT #6) — the
  * [[graft.sources]] ApiConformanceSpec pattern applied to
  * [[MediaDecoder]]: the SAME assertions run against every shipped
  * implementation, and an FFmpeg/JNI binding swapped in later must
  * pass this suite unchanged (add it to `impls` below). This is what
  * turns "swap the codec without touching the plumbing" from a
  * comment into a pinned contract.
  *
  * Payload classes exercised: real PNG/GIF/JPEG/WAV/AVI fixture bytes,
  * the corrupt (5-byte truncated) class, empty, and null. Contract
  * points: fixed output width, purity/determinism, never-throws,
  * null-means-defer, and the stub's terminal guarantee.
  */
class MediaDecoderConformanceSpec extends AnyFunSuite {

  private val impls: Seq[(MediaDecoder, Boolean)] = // (decoder, terminal)
    Seq(JdkMediaDecoder -> false, StubMediaDecoder -> true) ++
      // third implementation when an ffmpeg binary is present (r16
      // VERDICT #7): the CLI binding runs the SAME contract suite; on
      // a binary-less box its tests cancel cleanly via the assume below
      (if (FfmpegMediaDecoder.available) Seq(FfmpegMediaDecoder -> false) else Seq.empty)

  private val Dim = 64
  private val Frames = 4

  // one healthy doc per modality class: a PIXEL-decodable PNG (the
  // q194 pattern image — payload()'s class-0 PNG is header-only
  // IHDR+IEND and rightly defers), a complete PCM WAV, and the q198
  // uncompressed AVI; plus damage cases
  private val png = MediaFixture.patternPng(4L)
  private val wav = MediaFixture.payload(3L)
  private val avi = MediaFixture.aviPayload(1L)
  private val corrupt = MediaFixture.payload(13L) // %13 == 0 → 5-byte truncation
  private val garbage = Array.fill[Byte](256)(0x5A)

  for ((dec, terminal) <- impls) {

    test(s"[${dec.name}] non-null outputs are exactly the requested width") {
      for (p <- Seq(png, wav, avi, corrupt, garbage)) {
        Option(dec.imageFeatures(p, Dim)).foreach(f => assert(f.length == Dim))
        Option(dec.audioFeatures(p, Dim)).foreach(f => assert(f.length == Dim))
        Option(dec.videoFrames(p, Frames, Dim)).foreach { fs =>
          assert(fs.length <= Frames)
          fs.foreach(f => assert(f.length == Dim))
        }
      }
    }

    test(s"[${dec.name}] decode is pure: same bytes, same output") {
      def same(a: Array[Float], b: Array[Float]): Boolean =
        (a == null && b == null) || (a != null && b != null && a.sameElements(b))
      for (p <- Seq(png, wav, avi, garbage)) {
        assert(same(dec.imageFeatures(p, Dim), dec.imageFeatures(p, Dim)))
        assert(same(dec.audioFeatures(p, Dim), dec.audioFeatures(p, Dim)))
        val (v1, v2) = (dec.videoFrames(p, Frames, Dim), dec.videoFrames(p, Frames, Dim))
        assert((v1 == null) == (v2 == null))
        if (v1 != null) v1.zip(v2).foreach { case (a, b) => assert(a.sameElements(b)) }
      }
    }

    test(s"[${dec.name}] corrupt, empty, and null payloads never throw") {
      for (p <- Seq(corrupt, Array.empty[Byte], null)) {
        dec.imageFeatures(p, Dim); dec.audioFeatures(p, Dim)
        dec.videoFrames(p, Frames, Dim)
      }
    }

    if (terminal)
      test(s"[${dec.name}] terminal: never defers on a non-null payload") {
        for (p <- Seq(png, wav, avi, corrupt, garbage, Array.empty[Byte])) {
          assert(dec.imageFeatures(p, Dim) != null)
          assert(dec.audioFeatures(p, Dim) != null)
          assert(dec.videoFrames(p, Frames, Dim) != null)
        }
      }
    else
      test(s"[${dec.name}] defers (null) on payloads it has no codec for") {
        // the corrupt class and arbitrary bytes must hand off to the
        // next decoder, not fabricate features
        for (p <- Seq(corrupt, garbage)) {
          assert(dec.imageFeatures(p, Dim) == null)
          assert(dec.videoFrames(p, Frames, Dim) == null)
        }
        assert(dec.audioFeatures(corrupt, Dim) == null)
      }
  }

  test("ffmpeg binding: absent binary means every decode defers (no throw, no fabrication)") {
    if (!FfmpegMediaDecoder.available) {
      // the env-gated path on a binary-less box: pure defer
      assert(FfmpegMediaDecoder.imageFeatures(png, Dim) == null)
      assert(FfmpegMediaDecoder.audioFeatures(wav, Dim) == null)
      assert(FfmpegMediaDecoder.videoFrames(avi, Frames, Dim) == null)
      info("ffmpeg binary not present — CLI-binding contract section skipped")
    } else {
      // with a binary, the real decode paths must produce features for
      // the healthy fixtures (the full contract runs via `impls` above)
      assert(FfmpegMediaDecoder.imageFeatures(png, Dim) != null)
      assert(FfmpegMediaDecoder.audioFeatures(wav, Dim) != null)
    }
  }

  test("the JDK decoder actually decodes: real pixels, PCM, and demuxed frames") {
    assert(JdkMediaDecoder.imageFeatures(png, Dim) != null)
    assert(JdkMediaDecoder.audioFeatures(wav, Dim) != null)
    val frames = JdkMediaDecoder.videoFrames(avi, Frames, Dim)
    assert(frames != null && frames.nonEmpty)
  }

  test("Multimodal.decodeFeatures routes through the chain (the single swap-in point)") {
    // chain result ≡ public entry point, per modality — so a decoder
    // prepended to DecoderChain is picked up everywhere, no other edits
    def viaChain(p: Array[Byte], modality: String): Array[Float] = modality match {
      case "image" => Multimodal.DecoderChain.iterator
        .map(_.imageFeatures(p, Dim)).find(_ != null)
        .getOrElse(Multimodal.decodeStub(p, Dim))
      case "audio" => Multimodal.DecoderChain.iterator
        .map(_.audioFeatures(p, Dim)).find(_ != null)
        .getOrElse(Multimodal.decodeStub(p, Dim))
      case _ => Multimodal.decodeStub(p, Dim)
    }
    for ((p, m) <- Seq(png -> "image", wav -> "audio", corrupt -> "image",
        garbage -> "audio", avi -> "video"))
      assert(Multimodal.decodeFeatures(p, m, Dim).sameElements(viaChain(p, m)), m)
  }
}
