package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl.{crossHash60, crossHash60Sql}
import graft.operators.{MediaFixture, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal (binary-column) queries — the media ingest/census/dedup
  * surface, oracle-gated (r14 VERDICT #1: the one extension axis that
  * had only spec coverage).
  *
  * Gate design — the derived-fixture discipline on binary data: the
  * corpus carries no media, so payloads are synthesized per doc_id by
  * [[graft.operators.MediaFixture]] from CLOSED-FORM parameters, and
  * the census values on the Spark side come exclusively from PARSING
  * THE BYTES ([[Multimodal.imageMeta]]'s PNG/GIF/JPEG header walks,
  * [[Multimodal.audioMeta]]'s RIFF chunk scan, and for q194 the JDK's
  * actual PNG pixel decoder), while the DuckDB oracle recomputes the
  * same numbers arithmetically from the generator parameters — it
  * never sees a byte. Any disagreement between what the generator
  * encoded and what the parser recovered (wrong IHDR offset, LE/BE
  * swap, lossy decode, broken chunk skip) breaks the hash compare.
  * Same premise as q168's canonical-source carry: the generator IS the
  * oracle's ground truth, and the engine is graded on reproducing it
  * through the real byte path.
  *
  * Reference scope note: the reference pipeline framework
  * (/root/reference/motorway) has no media support at all — this axis
  * is the builder brief's large-scale-training-pipeline extension.
  *
  * Scale shapes (both queries): payload synthesis + parse are per-row
  * map work (binary never leaves its row, never shuffles — only the
  * few extracted integers do); the census is ONE hash-aggregate
  * exchange at (modality, mime) / fingerprint grain. At 100 TB the
  * payloads would arrive from object storage as a parquet binary
  * column; everything downstream of the scan is identical, and the
  * heavy decode runs inside the scan's partitions
  * ([[Multimodal.extractFeatures]] is the bounded-batch variant).
  */
object Media {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  // -- q193: media metadata census -----------------------------------------
  // Per (declared modality, PARSED mime — 'rejected' when no parser
  // recognizes the payload): media count and exact integer dimension /
  // rate / duration aggregates. The corrupt class (doc_id % 13 = 0,
  // payloads truncated to 5 bytes) pins the rejection path: a parser
  // that "recovers" metadata from truncated bytes diverges from the
  // oracle as loudly as one that drops valid media.
  private val genPayload = udf((docId: Long) => MediaFixture.payload(docId))
  private val probeImage = udf((p: Array[Byte]) => Option(Multimodal.imageMeta(p)))
  private val probeAudio = udf((p: Array[Byte]) => Option(Multimodal.audioMeta(p)))

  val q193 = q("q193_media_census",
    s"""WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 3 THEN 'audio' ELSE 'image' END AS modality,
      |    CASE WHEN doc_id % 13 = 0 THEN 'rejected'
      |         WHEN doc_id % 4 = 0 THEN 'image/png'
      |         WHEN doc_id % 4 = 1 THEN 'image/gif'
      |         WHEN doc_id % 4 = 2 THEN 'image/jpeg'
      |         ELSE 'audio/wav' END AS mime,
      |    CASE WHEN doc_id % 13 = 0 OR doc_id % 4 = 3 THEN 0
      |         ELSE 16 + doc_id % 97 END AS w,
      |    CASE WHEN doc_id % 13 = 0 OR doc_id % 4 = 3 THEN 0
      |         ELSE 16 + doc_id % 61 END AS h,
      |    CASE WHEN doc_id % 13 = 0 OR doc_id % 4 <> 3 THEN 0
      |         ELSE 8000 + (doc_id % 5) * 4000 END AS rate,
      |    CASE WHEN doc_id % 13 = 0 OR doc_id % 4 <> 3 THEN 0
      |         ELSE ((1000 + doc_id % 512) * 1000)
      |              // (8000 + (doc_id % 5) * 4000) END AS dur
      |  FROM documents)
      |SELECT modality, mime,
      |  CAST(count(*) AS BIGINT) AS n_media,
      |  CAST(sum(w) AS BIGINT) AS sum_w, CAST(min(w) AS BIGINT) AS min_w,
      |  CAST(max(w) AS BIGINT) AS max_w,
      |  CAST(sum(h) AS BIGINT) AS sum_h,
      |  CAST(sum(rate) AS BIGINT) AS sum_rate,
      |  CAST(sum(dur) AS BIGINT) AS sum_dur_ms
      |FROM m GROUP BY modality, mime ORDER BY modality, mime""".stripMargin) {
    (s, dir) =>
      val media = Tables(s, dir).documents.select(col("doc_id"))
        .withColumn("payload", genPayload(col("doc_id")))
        .withColumn("im", probeImage(col("payload")))
        .withColumn("am", probeAudio(col("payload")))
      media.select(
          // modality is generator INTENT (an ingest manifest column);
          // everything else below comes from the parsed bytes only
          when(col("doc_id") % 4 === 3, "audio").otherwise("image").as("modality"),
          coalesce(col("im.mime"), col("am.mime"), lit("rejected")).as("mime"),
          coalesce(col("im.width"), lit(0)).cast(LongType).as("w"),
          coalesce(col("im.height"), lit(0)).cast(LongType).as("h"),
          coalesce(col("am.sampleRate"), lit(0)).cast(LongType).as("rate"),
          coalesce(col("am.durationMs"), lit(0L)).as("dur"))
        .groupBy("modality", "mime")
        .agg(count(lit(1)).as("n_media"),
          sum("w").as("sum_w"), min("w").as("min_w"), max("w").as("max_w"),
          sum("h").as("sum_h"),
          sum("rate").as("sum_rate"), sum("dur").as("sum_dur_ms"))
        .orderBy("modality", "mime")
  }

  // -- q194: media near-dup groups via real pixel decode --------------------
  // Every document gets a real, decodable 32x32 pattern PNG (pattern
  // p = doc_id % 37, so ~n/37 documents share each pattern exactly);
  // the engine DECODES the pixels (JDK PNG reader), pools them into a
  // 4x4 grid of integer channel sums, fingerprints the vector, and
  // reports each duplicate group with an id-sum membership checksum
  // (the q192 discipline). The oracle computes the pooled sums in
  // closed form from p — 64 pixels per block, each cellValue(p,cx,cy)
  // — so ANY loss or misalignment in encode→decode→pool breaks it.
  private val gridFp = udf { (docId: Long) =>
    val cells = MediaFixture.gridSums(MediaFixture.patternPng(docId))
    if (cells == null) null else cells.mkString(",")
  }

  val q194 = q("q194_media_dedup_groups",
    s"""WITH f AS (
      |  SELECT doc_id,
      |    array_to_string(list_transform(range(16), c ->
      |      64 * (((doc_id % 37) * 31 + (c % 4) * 4 + (c // 4)) % 256)),
      |      ',') AS cells
      |  FROM documents)
      |SELECT ${crossHash60Sql("cells")} AS group_fp,
      |  CAST(count(*) AS BIGINT) AS n_imgs,
      |  CAST(count(*) - 1 AS BIGINT) AS n_dup,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
      |  CAST(min(doc_id) AS BIGINT) AS canonical_id
      |FROM f GROUP BY cells ORDER BY group_fp""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents.select(col("doc_id"))
      .withColumn("cells", gridFp(col("doc_id")))
      .groupBy(col("cells"))
      .agg(count(lit(1)).as("n_imgs"),
        (count(lit(1)) - 1).as("n_dup"),
        sum("doc_id").as("sum_doc_id"),
        min("doc_id").as("canonical_id"))
      .select(crossHash60(col("cells")).as("group_fp"),
        col("n_imgs"), col("n_dup"), col("sum_doc_id"), col("canonical_id"))
      .orderBy("group_fp")
  }

  // -- q197: audio energy envelope via real PCM decode ----------------------
  // The audio twin of q194: every document gets a complete valid WAV
  // whose 2048 signed-16-bit samples are the closed form
  // pcmSample(doc_id, i); the engine decodes it through
  // javax.sound.sampled (container framing, format, endianness all
  // handled by the JRE's actual decoder) and emits an 8-window integer
  // energy envelope (sum of |sample| per window) + its fingerprint,
  // while the oracle recomputes the windows arithmetically. Any
  // decoder misread — frame offset, sign, endianness, a dropped
  // sample — diverges. This closes the oracle gap on the audio DECODE
  // path (q193 gates only the header probe).
  private val envelope = udf { (docId: Long) =>
    // one synthesize+decode per row: env string and total travel
    // together so the decoder runs once
    val sums = MediaFixture.pcmWindowSums(
      MediaFixture.pcmWav(docId), MediaFixture.PcmWindows)
    if (sums == null) None else Some((sums.mkString(","), sums.sum))
  }

  val q197 = q("q197_audio_energy_envelope",
    s"""WITH s AS (
      |  SELECT doc_id, list_transform(range(8), w ->
      |      list_sum(list_transform(range(w*256, (w+1)*256),
      |        i -> abs(((doc_id * 7919 + i * 31) % 65536) - 32768)))) AS sums
      |  FROM documents)
      |SELECT doc_id,
      |  ${crossHash60Sql("array_to_string(sums, ',')")} AS env_fp,
      |  CAST(list_sum(sums) AS BIGINT) AS total_abs
      |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents.select(col("doc_id"))
      .withColumn("env", envelope(col("doc_id")))
      .select(col("doc_id"),
        crossHash60(col("env._1")).as("env_fp"),
        col("env._2").as("total_abs"))
      .orderBy("doc_id")
  }

  // -- q198: video frame-sample census via real AVI demux -------------------
  // The video twin of q194/q197 — closes the LAST fake decode path
  // (r14 VERDICT listed video as "documented deterministic fake"; the
  // JDK ships no compressed codec, but container demux needs none):
  // every document gets a complete spec-valid uncompressed AVI
  // (RIFF/hdrl/avih/strl/strh/strf + movi with one 24-bit bottom-up
  // DIB '00db' chunk per frame, 4 + doc_id%5 frames of 16x16 solid
  // 4x4 blocks whose B/G/R channels are DISTINCT closed forms). The
  // engine demuxes the real chunk tree (Multimodal.videoMeta +
  // sampleAviFrames), samples every 2nd frame, and pools each kept
  // frame's RED channel into 4x4 integer grid sums; the oracle
  // recomputes frames/duration/sample count/grid sums arithmetically.
  // Any demux misread — a wrong avih offset, a missed LIST recursion,
  // RGB/BGR swap, top-down/bottom-up flip, off-by-one stride — breaks
  // the hash. The corrupt class (doc_id%13, truncated to 5 bytes)
  // pins rejection. Synthesis+demux+pool are per-row map work (the
  // binary never leaves its row); output is doc-grain like q197.
  private val vidCensus = udf { (docId: Long) =>
    val payload = MediaFixture.aviPayload(docId)
    val meta = Multimodal.videoMeta(payload)
    val grids = Multimodal.sampleAviFrames(
      payload, MediaFixture.FrameStride, MediaFixture.VideoGrid)
    if (meta == null || grids == null)
      ("rejected", 0L, 0L, 0L, "", 0L)
    else
      ("video/avi", meta.frames.toLong, meta.durationMs, grids.length.toLong,
        grids.map(_.mkString(",")).mkString(";"), grids.map(_.sum).sum)
  }

  val q198 = q("q198_video_frame_census",
    s"""WITH v AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS nf, doc_id % 13 = 0 AS rej
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, nf, rej,
      |    list_transform(range(0, CAST(nf AS INTEGER), 2), fr ->
      |      list_transform(range(16), c ->
      |        16 * ((doc_id * 31 + fr * 53 + (c % 4) * 4 + (c // 4) + 2) % 256))) AS cells
      |  FROM v)
      |SELECT doc_id,
      |  CASE WHEN rej THEN 'rejected' ELSE 'video/avi' END AS mime,
      |  CAST(CASE WHEN rej THEN 0 ELSE nf END AS BIGINT) AS n_frames,
      |  CAST(CASE WHEN rej THEN 0 ELSE nf * 100 END AS BIGINT) AS dur_ms,
      |  CAST(CASE WHEN rej THEN 0 ELSE (nf + 1) // 2 END AS BIGINT) AS n_sampled,
      |  ${crossHash60Sql(
           "CASE WHEN rej THEN '' ELSE array_to_string(list_transform(cells, fc -> array_to_string(fc, ',')), ';') END")} AS frames_fp,
      |  CAST(CASE WHEN rej THEN 0
      |       ELSE list_sum(list_transform(cells, fc -> list_sum(fc))) END AS BIGINT) AS total_red
      |FROM g ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents.select(col("doc_id"))
      .withColumn("v", vidCensus(col("doc_id")))
      .select(col("doc_id"),
        col("v._1").as("mime"),
        col("v._2").as("n_frames"),
        col("v._3").as("dur_ms"),
        col("v._4").as("n_sampled"),
        crossHash60(col("v._5")).as("frames_fp"),
        col("v._6").as("total_red"))
      .orderBy("doc_id")
  }

  // -- q199: cross-video frame-level dedup ----------------------------------
  // Frame-grain near-dup across videos — the video analogue of q194's
  // image groups: each demuxed sampled frame's grid-sum fingerprint is
  // grouped corpus-wide, so identical frames appearing in DIFFERENT
  // videos land in one group (the fixture's closed form makes frame
  // content depend on (doc_id*31 + f*53) mod 256 only, so cross-video
  // collisions are guaranteed and the oracle enumerates them exactly).
  // Shape: one Generate (frame explode) + a TWO-LEVEL aggregate —
  // (frame_fp, doc_id) first, then frame_fp — the q178 discipline that
  // avoids a count-distinct Expand; only (doc_id, f, 16 small ints)
  // ride the shuffle, never the payload. Corrupt docs demux to null →
  // excluded, mirrored by the oracle's WHERE.
  private val frameFps = udf { (docId: Long) =>
    val grids = Multimodal.sampleAviFrames(
      MediaFixture.aviPayload(docId), MediaFixture.FrameStride, MediaFixture.VideoGrid)
    if (grids == null) Array.empty[(Int, String)]
    else grids.zipWithIndex.map { case (cells, gi) =>
      (gi * MediaFixture.FrameStride, cells.mkString(","))
    }
  }

  val q199 = q("q199_video_frame_dedup",
    s"""WITH v AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS nf FROM documents
      |  WHERE doc_id % 13 <> 0),
      |fr AS (
      |  SELECT doc_id, unnest(range(0, CAST(nf AS INTEGER), 2)) AS f FROM v),
      |fp AS (
      |  SELECT doc_id, f,
      |    array_to_string(list_transform(range(16), c ->
      |      16 * ((doc_id * 31 + f * 53 + (c % 4) * 4 + (c // 4) + 2) % 256)), ',') AS cells
      |  FROM fr),
      |lvl1 AS (
      |  SELECT cells, doc_id, count(*) AS nfr, sum(doc_id * 7 + f) AS chk
      |  FROM fp GROUP BY 1, 2)
      |SELECT ${crossHash60Sql("cells")} AS group_fp,
      |  CAST(count(*) AS BIGINT) AS n_videos,
      |  CAST(sum(nfr) AS BIGINT) AS n_frames,
      |  CAST(sum(chk) AS BIGINT) AS sum_chk
      |FROM lvl1 GROUP BY cells ORDER BY group_fp""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents.select(col("doc_id"))
      .select(col("doc_id"), explode(frameFps(col("doc_id"))).as("fr"))
      .select(col("doc_id"), col("fr._1").as("f"), col("fr._2").as("cells"))
      .groupBy("cells", "doc_id")
      .agg(count(lit(1)).as("nfr"),
        sum(col("doc_id") * 7 + col("f")).as("chk"))
      .groupBy("cells")
      .agg(count(lit(1)).as("n_videos"), sum("nfr").as("n_frames"),
        sum("chk").as("sum_chk"))
      .select(crossHash60(col("cells")).as("group_fp"),
        col("n_videos"), col("n_frames"), col("sum_chk"))
      .orderBy("group_fp")
  }

  // -- q200: image resolution/aspect gate census -----------------------------
  // The standard multimodal curation filter (LAION/DataComp drop
  // images below a minimum resolution and outside an aspect-ratio
  // band): per (source, verdict) bill over the image classes of the
  // q193 fixture, with w/h coming from the REAL header parse
  // (imageMeta), never the generator. Verdict precedence mirrors the
  // production gates: rejected (unparseable) > too_small
  // (min(w,h) < 32) > extreme_aspect (max > 2·min) > ok.
  // aspect_milli = 1000·max/min in integer division — exact in both
  // engines. Map-only + one aggregate; audio-class docs are excluded
  // by the modality manifest (doc_id % 4 <> 3), matching the oracle.
  val q200 = q("q200_image_gate_census",
    s"""WITH m AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 13 = 0 THEN 0 ELSE 16 + doc_id % 97 END AS w,
      |    CASE WHEN doc_id % 13 = 0 THEN 0 ELSE 16 + doc_id % 61 END AS h
      |  FROM documents WHERE doc_id % 4 <> 3),
      |v AS (
      |  SELECT source, w, h,
      |    CASE WHEN w = 0 THEN 'rejected'
      |         WHEN least(w, h) < 32 THEN 'too_small'
      |         WHEN greatest(w, h) > 2 * least(w, h) THEN 'extreme_aspect'
      |         ELSE 'ok' END AS verdict,
      |    CASE WHEN w = 0 THEN 0
      |         ELSE (1000 * greatest(w, h)) // least(w, h) END AS aspect_milli
      |  FROM m)
      |SELECT source, verdict,
      |  CAST(count(*) AS BIGINT) AS n_imgs,
      |  CAST(sum(w) AS BIGINT) AS sum_w,
      |  CAST(sum(h) AS BIGINT) AS sum_h,
      |  CAST(max(aspect_milli) AS BIGINT) AS max_aspect_milli
      |FROM v GROUP BY source, verdict ORDER BY source, verdict""".stripMargin) {
    (s, dir) =>
      val media = Tables(s, dir).documents
        .where(col("doc_id") % 4 =!= 3) // image classes of the manifest
        .select(col("doc_id"), col("source"))
        .withColumn("payload", genPayload(col("doc_id")))
        .withColumn("im", probeImage(col("payload")))
        .select(col("source"),
          coalesce(col("im.width"), lit(0)).cast(LongType).as("w"),
          coalesce(col("im.height"), lit(0)).cast(LongType).as("h"))
      media.select(col("source"), col("w"), col("h"),
          when(col("w") === 0, "rejected")
            .when(least(col("w"), col("h")) < 32, "too_small")
            .when(greatest(col("w"), col("h")) > lit(2) * least(col("w"), col("h")),
              "extreme_aspect")
            .otherwise("ok").as("verdict"),
          when(col("w") === 0, 0L)
            .otherwise(floor(lit(1000) * greatest(col("w"), col("h")) /
              least(col("w"), col("h")))).as("aspect_milli"))
        .groupBy("source", "verdict")
        .agg(count(lit(1)).as("n_imgs"),
          sum("w").as("sum_w"), sum("h").as("sum_h"),
          max("aspect_milli").as("max_aspect_milli"))
        .orderBy("source", "verdict")
  }

  val all: Seq[GraftQuery] = Seq(q193, q194, q197, q198, q199, q200)
}
