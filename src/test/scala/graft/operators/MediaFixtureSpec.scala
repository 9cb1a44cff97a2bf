package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The q193/q194 oracle premise, pinned at the byte level: the fixture
  * generator's closed-form parameters must round-trip through the REAL
  * parsers ([[Multimodal.imageMeta]]'s header walks,
  * [[Multimodal.audioMeta]]'s RIFF chunk scan, the JDK PNG pixel
  * decoder) — this is the engine-side half of the cross-engine gate,
  * checked exhaustively over a doc_id range where the oracle only
  * samples via the census hash. */
class MediaFixtureSpec extends AnyFunSuite {

  test("image payloads round-trip width/height/mime through the real header parsers") {
    (0L until 400L).filterNot(MediaFixture.corrupt).foreach { id =>
      val m = Multimodal.imageMeta(MediaFixture.payload(id))
      (id % 4) match {
        case 0 => assert(m != null && m.mime == "image/png", s"doc $id")
        case 1 => assert(m != null && m.mime == "image/gif", s"doc $id")
        case 2 => assert(m != null && m.mime == "image/jpeg", s"doc $id")
        case _ => assert(m == null, s"doc $id: WAV must not parse as image")
      }
      if (id % 4 != 3) {
        assert(m.width == MediaFixture.width(id), s"doc $id width")
        assert(m.height == MediaFixture.height(id), s"doc $id height")
      }
    }
  }

  test("WAV payloads round-trip rate/duration through the RIFF chunk scan AND the JDK reader") {
    (0L until 400L).filter(id => id % 4 == 3 && !MediaFixture.corrupt(id)).foreach { id =>
      val am = Multimodal.audioMeta(MediaFixture.payload(id))
      assert(am != null && am.mime == "audio/wav" && am.channels == 1, s"doc $id")
      assert(am.sampleRate == MediaFixture.sampleRate(id), s"doc $id rate")
      val expectMs = MediaFixture.frames(id) * 1000L / MediaFixture.sampleRate(id)
      assert(am.durationMs == expectMs, s"doc $id duration")
      // the fixture is a COMPLETE valid WAV, not just header-shaped:
      val in = Multimodal.decodeAudio(MediaFixture.payload(id))
      assert(in != null, s"doc $id: AudioSystem must read the fixture")
      assert(in.getFormat.getSampleRate.toInt == MediaFixture.sampleRate(id))
      assert(in.getFrameLength == MediaFixture.frames(id).toLong)
    }
  }

  test("corrupt payloads (truncated to 5 bytes) are rejected by every parser") {
    (0L until 400L).filter(MediaFixture.corrupt).foreach { id =>
      val p = MediaFixture.payload(id)
      assert(p.length == 5, s"doc $id")
      assert(Multimodal.imageMeta(p) == null, s"doc $id")
      assert(Multimodal.audioMeta(p) == null, s"doc $id")
    }
  }

  test("pattern PNG decode -> grid pooling recovers the closed-form cell sums exactly") {
    (0L until 80L).foreach { id =>
      val cells = MediaFixture.gridSums(MediaFixture.patternPng(id))
      assert(cells != null && cells.length == 16, s"doc $id")
      val p = id % MediaFixture.PatternMod
      (0 until 16).foreach { c =>
        val expect = 64L * MediaFixture.cellValue(p, c % 4, c / 4)
        assert(cells(c) == expect, s"doc $id cell $c: ${cells(c)} != $expect")
      }
    }
  }

  test("PCM fixture round-trips through the real JDK decoder: every sample, every window") {
    (0L until 40L).foreach { id =>
      val sums = MediaFixture.pcmWindowSums(
        MediaFixture.pcmWav(id), MediaFixture.PcmWindows)
      assert(sums != null && sums.length == MediaFixture.PcmWindows, s"doc $id")
      val n = MediaFixture.PcmFrames
      val expect = new Array[Long](MediaFixture.PcmWindows)
      (0 until n).foreach { i =>
        val w = math.min(MediaFixture.PcmWindows - 1, i * MediaFixture.PcmWindows / n)
        expect(w) += math.abs(MediaFixture.pcmSample(id, i))
      }
      assert(sums.toSeq == expect.toSeq, s"doc $id envelope")
    }
    // non-conforming formats are refused, not misread: stereo/8-bit
    assert(MediaFixture.pcmWindowSums(MediaFixture.wav(8000, 100), 8) != null)
    assert(MediaFixture.pcmWindowSums("junk".getBytes, 8) == null)
    assert(MediaFixture.pcmWindowSums(null, 8) == null)
  }

  test("audioMeta is robust: skips LIST chunks, rejects junk and non-RIFF") {
    // WAV with an interposed LIST chunk before fmt/data
    val base = MediaFixture.wav(16000, 100)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val withList = base.take(12) ++ list ++ base.drop(12)
    // fix RIFF size (not checked by the probe, but keep honest bytes)
    val am = Multimodal.audioMeta(withList)
    assert(am != null && am.sampleRate == 16000 && am.durationMs == 100 * 1000L / 16000)
    assert(Multimodal.audioMeta("not audio at all, just text padding to 44+ bytes....."
      .getBytes("US-ASCII")) == null)
    assert(Multimodal.audioMeta(Array.fill[Byte](100)(0x41)) == null)
    assert(Multimodal.audioMeta(null) == null)
  }
}
