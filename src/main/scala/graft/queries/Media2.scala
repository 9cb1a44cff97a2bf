package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl.{crossHash60, crossHash60Sql}
import graft.operators.{MediaFixture, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Second multimodal batch — the media-curation operators a training
  * pipeline runs AFTER ingest-census (q193) and exact pixel dedup
  * (q194): cross-modal alignment scoring (the CLIP-score gate shape),
  * perceptual-hash near-duplicate pairing (Hamming-ball dedup, not just
  * exact), the audio quality gate (clipping / DC offset / dropout
  * windows), audio fingerprint dedup, and the video gate census —
  * completing a census/dedup/gate matrix across all three modalities
  * (image q193/q194+q202/q200, audio q197/q205/q203, video
  * q198/q199/q206). Same oracle premise as [[Media]]: payloads are
  * [[graft.operators.MediaFixture]] closed forms, the engine recovers
  * every number THROUGH THE REAL BYTE PATH (JDK PNG pixel decode, JDK
  * WAV sample decode), and the DuckDB oracle recomputes arithmetically
  * from the generator parameters — any decode loss or misalignment
  * breaks the hash compare.
  *
  * Reference scope note: the reference (/root/reference/motorway) has
  * no media support; this axis is the builder brief's
  * large-scale-training-pipeline extension.
  */
object Media2 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  // -- q201: cross-modal alignment score census ------------------------------
  // The LAION/DataComp gate shape: every (image, caption-embedding)
  // pair gets an alignment score and the release review reads the
  // per-source score census. Image features are the REAL pixel path
  // (JDK PNG decode -> 4x4 integer grid sums, q194's kernel); the
  // caption side is the embeddings table (vec_id = doc_id where a
  // caption embedding exists — an inner equi-join, NOT a fixture
  // derivation, so this query exercises the media<->embedding JOIN the
  // other media queries don't). The score is an exact integer dot
  // product: grid cell sums x the embedding's first 16 components
  // quantized to floor(e*1000) — float->double widening and floor are
  // IEEE-exact in both engines, and all downstream arithmetic is
  // integer, so the census is bit-identical. (A production CLIP score
  // is a float dot of two learned embeddings; the quantized-integer
  // form here is the determinism discipline, not a simplification of
  // the plan shape.)
  //
  // Scale: feature extraction is map-side in the corpus scan (payload
  // never shuffles — 16 longs do); the join is a doc_id=vec_id
  // equi-join, broadcast while the embedding side is small and
  // co-partitionable (bucket both by id) when it is corpus-sized.
  private val gridCells = udf { (docId: Long) =>
    MediaFixture.gridSums(MediaFixture.patternPng(docId))
  }

  val q201 = q("q201_crossmodal_align",
    s"""WITH g AS (
      |  SELECT d.doc_id, d.source,
      |    list_transform(range(16), c ->
      |      64 * (((d.doc_id % 37) * 31 + (c % 4) * 4 + (c // 4)) % 256)) AS cells,
      |    e.embedding AS emb
      |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
      |sc AS (
      |  SELECT source,
      |    CAST(list_sum(list_transform(range(16), i ->
      |      cells[i+1] * CAST(floor(CAST(emb[i+1] AS DOUBLE) * 1000) AS BIGINT)))
      |      AS BIGINT) AS score
      |  FROM g)
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |  CAST(sum(score) AS BIGINT) AS sum_score,
      |  CAST(min(score) AS BIGINT) AS min_score,
      |  CAST(max(score) AS BIGINT) AS max_score
      |FROM sc GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val docs = t.documents.select(col("doc_id"), col("source"))
      .withColumn("cells", gridCells(col("doc_id")))
    val emb = t.embeddings.select(col("vec_id"), col("embedding"))
    val score = (0 until 16)
      .map(i => col("cells").getItem(i) *
        floor(element_at(col("embedding"), i + 1).cast(DoubleType) * lit(1000.0))
          .cast(LongType))
      .reduce(_ + _)
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(col("source"), score.as("score"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum("score").as("sum_score"),
        min("score").as("min_score"),
        max("score").as("max_score"))
      .orderBy("source")
  }

  // -- q202: perceptual-hash near-dup pairs (Hamming-banded LSH) -------------
  // Beyond q194's exact-fingerprint groups: a 24-bit difference hash
  // (dHash — 12 horizontal + 12 vertical brightness comparisons on the
  // 4x4 grid of REAL decoded pixel sums) and the near-duplicate pairs
  // of hash GROUPS within Hamming distance 4. The pair space is built
  // the scale-safe way: group the corpus to distinct fingerprints
  // FIRST (corpus-size reduction), then band the 24 bits into 6 4-bit
  // bands and equi-join on (band, value) — by pigeonhole a pair within
  // Hamming h collides on >=1 band whenever h < 6, so the banded join
  // is provably COMPLETE for the h<=4 threshold (and the exact
  // bit_count filter after makes it sound). No cartesian anywhere: at
  // 100 TB the distinct-hash relation is corpus-scale and the band
  // join is what keeps the candidate space hash-bucketed.
  //
  // The fixture makes the answer nontrivial: patterns whose 16-value
  // run wraps mod 256 (p=8, p=33) flip exactly 4 / 2 comparisons
  // against the 35 non-wrapping patterns' all-ones hash, so the corpus
  // has exactly 3 distinct dHashes and 2 pairs within Hamming 4 at
  // every SF — the oracle enumerates them from the closed form.
  private val dhashUdf = udf { (docId: Long) =>
    val c = MediaFixture.gridSums(MediaFixture.patternPng(docId))
    var h = 0L
    var i = 0
    while (i < 12) { // horizontal: cells idx = cy*4+cx, neighbor cx+1
      val idx = (i / 3) * 4 + (i % 3)
      if (c(idx) < c(idx + 1)) h |= 1L << i
      i += 1
    }
    var j = 0
    while (j < 12) { // vertical: neighbor cy+1 = idx+4
      val idx = (j % 3) * 4 + (j / 3)
      if (c(idx) < c(idx + 4)) h |= 1L << (12 + j)
      j += 1
    }
    h
  }

  val q202 = q("q202_image_phash_neardup",
    s"""WITH h AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(12), i -> CASE WHEN
      |        (((doc_id % 37) * 31 + (i % 3) * 4 + (i // 3)) % 256) <
      |        (((doc_id % 37) * 31 + ((i % 3) + 1) * 4 + (i // 3)) % 256)
      |      THEN CAST(1 AS BIGINT) << i ELSE 0 END)) +
      |    list_sum(list_transform(range(12), j -> CASE WHEN
      |        (((doc_id % 37) * 31 + (j // 3) * 4 + (j % 3)) % 256) <
      |        (((doc_id % 37) * 31 + (j // 3) * 4 + (j % 3) + 1) % 256)
      |      THEN CAST(1 AS BIGINT) << (12 + j) ELSE 0 END)) AS BIGINT) AS dhash
      |  FROM documents),
      |grp AS (
      |  SELECT dhash, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(doc_id) AS BIGINT) AS chk
      |  FROM h GROUP BY dhash)
      |SELECT a.dhash AS ha, b.dhash AS hb,
      |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming,
      |  a.n_docs AS n_docs_a, b.n_docs AS n_docs_b,
      |  a.chk AS chk_a, b.chk AS chk_b
      |FROM grp a JOIN grp b ON a.dhash < b.dhash
      |WHERE bit_count(xor(a.dhash, b.dhash)) <= 4
      |ORDER BY ha, hb""".stripMargin) { (s, dir) =>
    val grp = Tables(s, dir).documents.select(col("doc_id"))
      .withColumn("dhash", dhashUdf(col("doc_id")))
      .groupBy("dhash")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("chk"))
    // 6 bands x 4 bits: complete for Hamming <= 5, filtered to <= 4
    val banded = grp.select(col("dhash"), col("n_docs"), col("chk"),
      explode(array((0 until 6).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), 4 * b).bitwiseAND(lit(15L)).as("bv"))): _*))
        .as("bb"))
      .select(col("dhash"), col("n_docs"), col("chk"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val a = banded.select(col("band"), col("bv"), col("dhash").as("ha"),
      col("n_docs").as("n_docs_a"), col("chk").as("chk_a"))
    val b = banded.select(col("band"), col("bv"), col("dhash").as("hb"),
      col("n_docs").as("n_docs_b"), col("chk").as("chk_b"))
    a.join(b, Seq("band", "bv"))
      .where(col("ha") < col("hb"))
      .select(col("ha"), col("hb"),
        expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("hamming"),
        col("n_docs_a"), col("n_docs_b"), col("chk_a"), col("chk_b"))
      .dropDuplicates(Seq("ha", "hb"))
      .where(col("hamming") <= 4)
      .orderBy("ha", "hb")
  }

  // -- q203: audio quality gate (clipping / DC offset / dropouts) -----------
  // The standard audio-curation checks (clipping rate, peak level, DC
  // offset, dropout/low-energy windows) over the q197 PCM fixture,
  // computed from the REAL JDK decode ([[MediaFixture.pcmSampleStats]])
  // and billed per (source, verdict) — verdict 'clipped' when >= 50 of
  // the 2048 samples sit at |s| >= 32000 (the fixture's sample law
  // makes the count vary 0..50 per doc, so both classes exist at every
  // SF). All stats are exact integers; the oracle replays the sample
  // closed form. Map-only + one aggregate; the payload never shuffles.
  //
  // Null path: pcmSampleStats returns null only for an undecodable
  // payload; this fixture has none (q197's WAVs are all complete) and
  // the oracle has no 'rejected' class, so the udf's None branch is
  // unreachable here. A corpus with corrupt audio should gate through
  // [[graft.streaming.StreamingMediaGate.audioVerdict]] (whose ladder
  // leads with 'rejected') rather than rely on the null-propagating
  // 'ok' fallthrough below.
  private val ClipAbs = 32000
  private val LowWindowSum = 4194304L // 2^22 — splits the 8 windows 3..5
  private val ClipVerdictAt = 50L

  private val audioStats = udf { (docId: Long) =>
    val st = MediaFixture.pcmSampleStats(
      MediaFixture.pcmWav(docId), ClipAbs, MediaFixture.PcmWindows, LowWindowSum)
    if (st == null) None else Some((st(0), st(1), st(2), st(3)))
  }

  val q203 = q("q203_audio_quality_gate",
    s"""WITH s AS (
      |  SELECT doc_id, source,
      |    list_transform(range(2048),
      |      i -> ((doc_id * 7919 + i * 31) % 65536) - 32768) AS sg,
      |    list_transform(range(8), w ->
      |      list_sum(list_transform(range(w*256, (w+1)*256),
      |        i -> abs(((doc_id * 7919 + i * 31) % 65536) - 32768)))) AS wins
      |  FROM documents),
      |m AS (
      |  SELECT source,
      |    CAST(list_sum(list_transform(sg,
      |      x -> CASE WHEN abs(x) >= $ClipAbs THEN 1 ELSE 0 END)) AS BIGINT) AS n_clip,
      |    CAST(list_max(list_transform(sg, x -> abs(x))) AS BIGINT) AS max_abs,
      |    CAST(list_sum(sg) AS BIGINT) AS dc_sum,
      |    CAST(len(list_filter(wins, w -> w < $LowWindowSum)) AS BIGINT) AS n_low
      |  FROM s)
      |SELECT source,
      |  CASE WHEN n_clip >= $ClipVerdictAt THEN 'clipped' ELSE 'ok' END AS verdict,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_clip) AS BIGINT) AS sum_clip,
      |  CAST(max(max_abs) AS BIGINT) AS max_peak,
      |  CAST(sum(dc_sum) AS BIGINT) AS sum_dc,
      |  CAST(sum(n_low) AS BIGINT) AS sum_low_windows
      |FROM m GROUP BY source, verdict ORDER BY source, verdict""".stripMargin) {
    (s, dir) =>
      Tables(s, dir).documents.select(col("doc_id"), col("source"))
        .withColumn("st", audioStats(col("doc_id")))
        .select(col("source"),
          col("st._1").as("n_clip"), col("st._2").as("max_abs"),
          col("st._3").as("dc_sum"), col("st._4").as("n_low"))
        .withColumn("verdict",
          when(col("n_clip") >= ClipVerdictAt, "clipped").otherwise("ok"))
        .groupBy("source", "verdict")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_clip").as("sum_clip"),
          max("max_abs").as("max_peak"),
          sum("dc_sum").as("sum_dc"),
          sum("n_low").as("sum_low_windows"))
        .orderBy("source", "verdict")
  }

  // -- q205: audio fingerprint dedup groups ----------------------------------
  // Completes the dedup column of the modality matrix (image q194/q202,
  // video q199, audio HERE): a coarse acoustic fingerprint — the
  // 8-window energy envelope from the REAL JDK sample decode, each
  // window quantized by >>16 (the chromaprint-style robustness trade:
  // nearby loudness profiles land on one fingerprint) — grouped
  // corpus-wide with q194's group-census shape (id-sum membership
  // checksum, min-id canonical). The fixture's sample law concentrates
  // window energies, so quantized collisions are plentiful at every SF
  // (hundreds of multi-member groups at sf0.1). Map-side decode + ONE
  // hash-aggregate exchange; the payload never shuffles.
  private val envFp = udf { (docId: Long) =>
    val sums = MediaFixture.pcmWindowSums(
      MediaFixture.pcmWav(docId), MediaFixture.PcmWindows)
    if (sums == null) null else sums.map(_ >> 16).mkString(",")
  }

  val q205 = q("q205_audio_fingerprint_dedup",
    s"""WITH s AS (
      |  SELECT doc_id,
      |    array_to_string(list_transform(
      |      list_transform(range(8), w ->
      |        list_sum(list_transform(range(w*256, (w+1)*256),
      |          i -> abs(((doc_id * 7919 + i * 31) % 65536) - 32768)))),
      |      x -> CAST(x AS BIGINT) >> 16), ',') AS fp
      |  FROM documents)
      |SELECT ${crossHash60Sql("fp")} AS group_fp,
      |  CAST(count(*) AS BIGINT) AS n_audio,
      |  CAST(count(*) - 1 AS BIGINT) AS n_dup,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
      |  CAST(min(doc_id) AS BIGINT) AS canonical_id
      |FROM s GROUP BY fp ORDER BY group_fp""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents.select(col("doc_id"))
      .withColumn("fp", envFp(col("doc_id")))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_audio"),
        (count(lit(1)) - 1).as("n_dup"),
        sum("doc_id").as("sum_doc_id"),
        min("doc_id").as("canonical_id"))
      .select(crossHash60(col("fp")).as("group_fp"),
        col("n_audio"), col("n_dup"), col("sum_doc_id"), col("canonical_id"))
      .orderBy("group_fp")
  }

  // -- q206: video gate census (duration + temporal activity) ---------------
  // Completes the gate column of the modality matrix (image q200,
  // audio q203, video HERE): the duration filter every video-curation
  // pipeline applies plus a temporal-activity metric — the summed
  // |Δ| of consecutive SAMPLED frames' grid sums, a motion detector
  // computed from the REAL AVI demux (a misread frame order, a dropped
  // sample, or a stride bug changes the deltas). Verdict precedence:
  // rejected (demux fails) > too_short (< 600 ms) > high_motion
  // (per-pair activity > 31000) > ok. The fixture's nf law aligns with
  // the source assignment (both are doc_id mods), so the DURATION
  // verdict is constant within a source — the motion split is what
  // varies within sources (mod-256 wrap count of the frame deltas) and
  // keeps the census non-derivable from the source name. All integers;
  // the oracle replays the fixture's frame law. Map-only + one
  // aggregate.
  private val vidGate = udf { (docId: Long) =>
    val payload = MediaFixture.aviPayload(docId)
    val meta = Multimodal.videoMeta(payload)
    val grids = Multimodal.sampleAviFrames(
      payload, MediaFixture.FrameStride, MediaFixture.VideoGrid)
    if (meta == null || grids == null) ("rejected", 0L, 0L, 0L)
    else {
      val activity = grids.sliding(2).collect { case Array(a, b) =>
        a.zip(b).map { case (x, y) => math.abs(y - x) }.sum
      }.sum
      val verdict =
        if (meta.durationMs < 600) "too_short"
        else if (activity > 31000L * (grids.length - 1)) "high_motion"
        else "ok"
      (verdict, meta.frames.toLong, meta.durationMs, activity)
    }
  }

  val q206 = q("q206_video_gate_census",
    s"""WITH v AS (
      |  SELECT doc_id, source, 4 + doc_id % 5 AS nf,
      |    doc_id % 13 = 0 AS rej, (4 + doc_id % 5 + 1) // 2 AS ns
      |  FROM documents),
      |a AS (
      |  SELECT source, nf, rej, ns,
      |    CASE WHEN rej THEN 0 ELSE
      |      list_sum(list_transform(range(CAST(ns - 1 AS INTEGER)), p ->
      |        list_sum(list_transform(range(16), c ->
      |          abs(16 * ((doc_id * 31 + (2*p + 2) * 53 + (c % 4) * 4 + (c // 4) + 2) % 256)
      |            - 16 * ((doc_id * 31 + 2*p * 53 + (c % 4) * 4 + (c // 4) + 2) % 256))))))
      |    END AS activity
      |  FROM v),
      |m AS (
      |  SELECT source,
      |    CASE WHEN rej THEN 'rejected'
      |         WHEN nf * 100 < 600 THEN 'too_short'
      |         WHEN activity > 31000 * (ns - 1) THEN 'high_motion'
      |         ELSE 'ok' END AS verdict,
      |    CASE WHEN rej THEN 0 ELSE nf END AS n_frames,
      |    CASE WHEN rej THEN 0 ELSE nf * 100 END AS dur_ms,
      |    activity
      |  FROM a)
      |SELECT source, verdict,
      |  CAST(count(*) AS BIGINT) AS n_videos,
      |  CAST(sum(n_frames) AS BIGINT) AS sum_frames,
      |  CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms,
      |  CAST(sum(activity) AS BIGINT) AS sum_activity
      |FROM m GROUP BY source, verdict ORDER BY source, verdict""".stripMargin) {
    (s, dir) =>
      Tables(s, dir).documents.select(col("doc_id"), col("source"))
        .withColumn("v", vidGate(col("doc_id")))
        .select(col("source"), col("v._1").as("verdict"),
          col("v._2").as("n_frames"), col("v._3").as("dur_ms"),
          col("v._4").as("activity"))
        .groupBy("source", "verdict")
        .agg(count(lit(1)).as("n_videos"),
          sum("n_frames").as("sum_frames"),
          sum("dur_ms").as("sum_dur_ms"),
          sum("activity").as("sum_activity"))
        .orderBy("source", "verdict")
  }

  val all: Seq[GraftQuery] = Seq(q201, q202, q203, q205, q206)
}
