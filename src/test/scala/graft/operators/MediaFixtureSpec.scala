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

  test("AVI fixture round-trips through the real demux: header, sampling, grid sums") {
    (0L until 120L).filterNot(MediaFixture.corrupt).foreach { id =>
      val p = MediaFixture.aviPayload(id)
      val vm = Multimodal.videoMeta(p)
      assert(vm != null && vm.mime == "video/avi", s"doc $id")
      assert(vm.width == MediaFixture.VideoSize && vm.height == MediaFixture.VideoSize)
      assert(vm.frames == MediaFixture.videoFrames(id), s"doc $id frames")
      assert(vm.durationMs == MediaFixture.videoFrames(id) * 100L, s"doc $id duration")
      val grids = Multimodal.sampleAviFrames(p, MediaFixture.FrameStride, MediaFixture.VideoGrid)
      assert(grids != null, s"doc $id demux")
      assert(grids.length == (vm.frames + 1) / 2, s"doc $id sample count")
      grids.zipWithIndex.foreach { case (cells, gi) =>
        val f = gi * MediaFixture.FrameStride
        (0 until 16).foreach { c =>
          val expect = 16L * ((MediaFixture.videoCellValue(id, f, c % 4, c / 4) + 2) % 256)
          assert(cells(c) == expect, s"doc $id frame $f cell $c: ${cells(c)} != $expect")
        }
      }
      // an AVI must not parse as image or audio
      assert(Multimodal.imageMeta(p) == null && Multimodal.audioMeta(p) == null, s"doc $id")
    }
    // corrupt class rejected by the video parsers too
    (0L until 120L).filter(MediaFixture.corrupt).foreach { id =>
      val p = MediaFixture.aviPayload(id)
      assert(p.length == 5 && Multimodal.videoMeta(p) == null &&
        Multimodal.sampleAviFrames(p, 2, 4) == null, s"doc $id")
    }
  }

  test("AVI demux honors DIB orientation and refuses compressed frames") {
    // stride 1 returns every frame; the demux must read BOTTOM-UP rows
    // (a top-down misread flips cy and breaks the cell values — pinned
    // above); here pin that a TOP-DOWN file (negative biHeight) is also
    // read correctly by flipping the stored rows of a bottom-up frame.
    val id = 7L
    val p = MediaFixture.avi(id)
    val all = Multimodal.sampleAviFrames(p, 1, 4)
    assert(all != null && all.length == MediaFixture.videoFrames(id))
    // locate strf's biHeight (LE32) and negate it + flip each frame's rows
    def le32At(b: Array[Byte], i: Int): Long =
      java.lang.Byte.toUnsignedInt(b(i)).toLong |
        (java.lang.Byte.toUnsignedInt(b(i + 1)).toLong << 8) |
        (java.lang.Byte.toUnsignedInt(b(i + 2)).toLong << 16) |
        (java.lang.Byte.toUnsignedInt(b(i + 3)).toLong << 24)
    val strfAt = {
      var at = -1
      (0 until p.length - 4).foreach { i =>
        if (at < 0 && new String(p, i, 4, "US-ASCII") == "strf") at = i
      }
      at
    }
    assert(strfAt > 0)
    val topDown = p.clone()
    val bhOff = strfAt + 8 + 8 // past fourcc+size, biSize+biWidth
    val h = le32At(topDown, bhOff).toInt
    val neg = -h
    topDown(bhOff) = neg.toByte
    topDown(bhOff + 1) = (neg >> 8).toByte
    topDown(bhOff + 2) = (neg >> 16).toByte
    topDown(bhOff + 3) = (neg >> 24).toByte
    val w = MediaFixture.VideoSize
    val rowBytes = w * 3
    (0 until p.length - 4).foreach { i =>
      if (new String(p, i, 4, "US-ASCII") == "00db") {
        val body = i + 8
        (0 until h / 2).foreach { r =>
          val a = body + r * rowBytes
          val b = body + (h - 1 - r) * rowBytes
          (0 until rowBytes).foreach { k =>
            val t = topDown(a + k); topDown(a + k) = topDown(b + k); topDown(b + k) = t
          }
        }
      }
    }
    val flipped = Multimodal.sampleAviFrames(topDown, 1, 4)
    assert(flipped != null && flipped.length == all.length)
    flipped.zip(all).foreach { case (fc, ac) => assert(fc.toSeq == ac.toSeq) }
    // compressed frames (biCompression != 0) are refused, not misread
    val compressed = p.clone()
    val compOff = strfAt + 8 + 16
    compressed(compOff) = 1
    assert(Multimodal.sampleAviFrames(compressed, 1, 4) == null)
    // but the header probe still reads avih fine
    assert(Multimodal.videoMeta(compressed) != null)
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
