package graft.queries

import graft.SparkSpecBase
import graft.operators.MediaFixture
import org.apache.spark.sql.functions._

/** Engine-side pins for the second media batch (q201–q203) and the
  * encoding-damage census (q204): the closed-form ↔ real-byte-path
  * equivalences the DuckDB oracles rely on, checked exhaustively where
  * the oracle only samples via the census hash, plus the band-LSH
  * completeness argument q202's plan depends on. */
class Media2Spec extends SparkSpecBase {

  /** The q202 dHash from REAL decoded pixels (same bit layout as the
    * query's kernel: 12 horizontal then 12 vertical comparisons). */
  private def dhashFromBytes(docId: Long): Long = {
    val c = MediaFixture.gridSums(MediaFixture.patternPng(docId))
    var h = 0L
    (0 until 12).foreach { i =>
      val idx = (i / 3) * 4 + (i % 3)
      if (c(idx) < c(idx + 1)) h |= 1L << i
    }
    (0 until 12).foreach { j =>
      val idx = (j % 3) * 4 + (j / 3)
      if (c(idx) < c(idx + 4)) h |= 1L << (12 + j)
    }
    h
  }

  /** The oracle's arithmetic dHash (no bytes anywhere). */
  private def dhashClosedForm(docId: Long): Long = {
    val p = docId % MediaFixture.PatternMod
    def g(cx: Int, cy: Int): Long = (p * 31 + cx * 4 + cy) % 256
    var h = 0L
    (0 until 12).foreach { i =>
      val (cx, cy) = (i % 3, i / 3)
      if (g(cx, cy) < g(cx + 1, cy)) h |= 1L << i
    }
    (0 until 12).foreach { j =>
      val (cx, cy) = (j / 3, j % 3)
      if (g(cx, cy) < g(cx, cy + 1)) h |= 1L << (12 + j)
    }
    h
  }

  test("q202 dHash: real PNG decode reproduces the closed form over every pattern") {
    (0L until 120L).foreach { id =>
      assert(dhashFromBytes(id) == dhashClosedForm(id), s"doc $id")
    }
  }

  test("q202 pairs equal the brute-force Hamming<=4 enumeration (band completeness)") {
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    val groups = ids.groupBy(dhashClosedForm).map { case (h, ds) =>
      h -> (ds.length.toLong, ds.sum)
    }
    val hs = groups.keys.toSeq.sorted
    val brute = for {
      a <- hs; b <- hs if a < b
      if java.lang.Long.bitCount(a ^ b) <= 4
    } yield (a, b, java.lang.Long.bitCount(a ^ b).toLong,
      groups(a)._1, groups(b)._1, groups(a)._2, groups(b)._2)
    val got = Media2.q202.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq
    assert(got == brute.sortBy(p => (p._1, p._2)), "band join must equal brute pairs")
    assert(got.nonEmpty, "the fixture guarantees wrapped-pattern pairs")
  }

  test("q202 runtime plan shares ONE corpus scan across both band-join sides") {
    // The optimized plan census records documents=2 (the fingerprint
    // aggregate is referenced by both join sides), but the decode UDF
    // must run over the corpus ONCE: the subtrees are canonically
    // identical, so runtime exchange reuse has to collapse them. This
    // is the round-12 q178 lesson as a gate — if a future edit pushes
    // a side-specific filter below the aggregate, this catches the
    // second decode pass.
    val df = Media2.q202.run(spark, sfDir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(finalPlan).length
    val reused = "ReusedExchange".r.findAllIn(finalPlan).length
    assert(scans <= 1 || reused >= 1,
      s"expected shared corpus scan; got $scans scans / $reused reused exchanges:\n$finalPlan")
  }

  test("q203 pcmSampleStats: real WAV decode reproduces the closed-form sample law") {
    (0L until 40L).foreach { id =>
      val st = MediaFixture.pcmSampleStats(
        MediaFixture.pcmWav(id), 32000, MediaFixture.PcmWindows, 4194304L)
      assert(st != null, s"doc $id")
      var nClip = 0L; var maxAbs = 0L; var dc = 0L
      val wins = new Array[Long](MediaFixture.PcmWindows)
      (0 until MediaFixture.PcmFrames).foreach { i =>
        val s = MediaFixture.pcmSample(id, i)
        if (math.abs(s) >= 32000) nClip += 1
        maxAbs = math.max(maxAbs, math.abs(s))
        dc += s
        wins(i * MediaFixture.PcmWindows / MediaFixture.PcmFrames) += math.abs(s)
      }
      val nLow = wins.count(_ < 4194304L).toLong
      assert(st.toSeq ==
        Seq(nClip, maxAbs, dc, nLow, MediaFixture.PcmFrames.toLong), s"doc $id")
    }
  }

  test("q203 census: both verdict classes exist and doc counts conserve") {
    val rows = Media2.q203.run(spark, sfDir).collect()
    val verdicts = rows.map(_.getString(1)).toSet
    assert(verdicts == Set("clipped", "ok"))
    val total = rows.map(_.getLong(2)).sum
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(total == nDocs)
  }

  test("q201: every embedding row pairs with its document (join completeness)") {
    val rows = Media2.q201.run(spark, sfDir).collect()
    val nPairs = rows.map(_.getLong(1)).sum
    val nEmb = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(nPairs == nEmb, "inner join on doc_id=vec_id must keep every embedding")
    // the per-pair score values are pinned by the DuckDB oracle's hash
    // compare at all SFs (closed-form cells x quantized embedding);
    // here pin that scores are non-degenerate (both signs occur)
    assert(rows.map(_.getLong(4)).min < 0 && rows.map(_.getLong(5)).max > 0)
  }

  test("q205: quantized envelope groups are real duplicates and conserve the corpus") {
    val rows = Media2.q205.run(spark, sfDir).collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "every doc lands in one group")
    assert(rows.exists(_.getLong(1) > 1), "the fixture guarantees multi-member groups")
    // group checksum algebra: n_dup = n_audio - 1, canonical <= sum/n
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) - 1)
      assert(r.getLong(4) * r.getLong(1) <= r.getLong(3))
    }
  }

  test("q206: verdict ladder fires all four classes; activity matches the frame law") {
    val rows = Media2.q206.run(spark, sfDir).collect()
    val verdicts = rows.map(_.getString(1)).toSet
    assert(verdicts == Set("rejected", "too_short", "high_motion", "ok"))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    // closed-form activity replay for a handful of demuxed docs
    (1L until 30L).filterNot(MediaFixture.corrupt).foreach { id =>
      val grids = graft.operators.Multimodal.sampleAviFrames(
        MediaFixture.aviPayload(id), MediaFixture.FrameStride, MediaFixture.VideoGrid)
      val real = grids.sliding(2).collect { case Array(a, b) =>
        a.zip(b).map { case (x, y) => math.abs(y - x) }.sum
      }.sum
      val ns = (MediaFixture.videoFrames(id) + 1) / 2
      val expect = (0 until ns - 1).map { p =>
        (0 until 16).map { c =>
          val k = (c % 4) * 4 + (c / 4) + 2
          math.abs(16L * ((id * 31 + (2 * p + 2) * 53 + k) % 256)
            - 16L * ((id * 31 + 2 * p * 53 + k) % 256))
        }.sum
      }.sum
      assert(real == expect, s"doc $id")
    }
  }

  test("q204: every repair removes exactly one character (bill algebra)") {
    val rows = Curation17.q204.run(spark, sfDir).collect()
    rows.foreach { r =>
      val (moji, fffd, ctrl, cut) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(cut == moji + fffd + ctrl,
        s"source ${r.getString(0)}: repaired chars must equal artifact count")
    }
    val total = rows.map(_.getLong(1)).sum
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(total == docs.count())
    // dirty docs = injected classes that actually gained an artifact
    val expectDirty = docs.where(
      (col("doc_id") % 11 === 5) || (col("doc_id") % 11 === 7) ||
        ((col("doc_id") % 11 === 3) && col("text").contains("e"))).count()
    assert(rows.map(_.getLong(2)).sum == expectDirty)
  }

  test("q204 control class detects NUL (r15 ADVICE) and strips it \u2014 tab/LF/CR excluded") {
    // pin via the shared detector regex semantics: a NUL-bearing string
    // must count and repair like any other C0 control, while the
    // whitespace controls stay exempt (the class' billed contract)
    val re = Curation17.CtrlRe.r
    assert(re.findAllIn("a\u0000b\u0007c").size == 2, "NUL + BEL both count")
    assert(re.findAllIn("a\tb\nc\rd").isEmpty, "tab/LF/CR are exempt")
    assert(re.replaceAllIn("x\u0000y", "") == "xy")
  }
}
