package graft.streaming

import graft.operators.{MediaFixture, Multimodal}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live media ingest gate — the streaming twin of the q200 (image
  * resolution/aspect), q203 (audio clipping), and q206 (video
  * duration/motion) batch gates: media
  * payloads arrive as a stream, each is adjudicated MAP-SIDE by the
  * exact batch verdict ladders over the REAL parsers
  * ([[Multimodal.imageMeta]]'s header walks,
  * [[MediaFixture.pcmSampleStats]]'s JDK sample decode) before any
  * shuffle, and keyed state per (source, modality) maintains the
  * running admission census so an ops dashboard can alert the moment a
  * source starts shipping broken or out-of-spec media (a crawler
  * hitting a thumbnail CDN shows up here batches before a batch census
  * would run). The batch q200/q203 verdicts and this gate agree by
  * construction — same ladder, same parsers
  * (StreamingMediaGateSpec pins the per-class census equality against
  * the registered batch queries on the fixture corpus).
  *
  * Verdict ladders (shared with the batch queries):
  *  - image: rejected (unparseable) > too_small (min(w,h) < minSide) >
  *    extreme_aspect (max > 2·min) > ok            — q200's ladder
  *  - audio: rejected (undecodable) > clipped (clip-rate ≥
  *    clipPerMille‰ of samples) > ok               — q203's ladder,
  *    rate-normalized so clips are duration-independent (at q203's
  *    fixed 2048-sample fixture the 24‰ default cuts at exactly
  *    nClip ≥ 50, the batch constant)
  *  - video: rejected (demux fails) > too_short (< 600 ms) >
  *    high_motion (per-pair activity > 31000) > ok — q206's ladder
  *    over the real AVI demux
  *  - any OTHER declared modality (a manifest typo): "unroutable",
  *    counted as dropped but distinct in the census, so a
  *    routing/manifest error never masquerades as media-quality
  *    rejections
  *
  * At-least-once: `seq` is the stream's monotone delivery sequence
  * (repeated only on redelivery). The ladders are stateless and
  * deterministic, so a redelivered payload re-emits its original
  * verdict; the per-key high-water fence protects the CENSUS — a
  * replay at or below the fence never re-counts into nSeen/nDropped
  * (the [[StreamingSourceCap]] discipline).
  *
  * Scale: parse/decode is per-row map work in the scan stage — the
  * PAYLOAD never crosses an exchange; only (docId, source, modality,
  * verdict, seq) shuffles to the census key. State per (source,
  * modality) is three longs — no per-document state, so an unbounded
  * stream needs no retention policy. Verdicts are append-mode.
  */
object StreamingMediaGate {

  /** One arriving media payload; `modality` is the ingest manifest's
    * declared kind (what routes it to a ladder — the parsers still
    * reject payloads that don't match). */
  final case class MediaRecord(docId: Long, source: String, modality: String,
      payload: Array[Byte], seq: Long)

  final case class MediaVerdict(docId: Long, source: String, modality: String,
      verdict: String, nSeen: Long, nDropped: Long, redelivered: Boolean,
      seq: Long)

  // public: GroupState/Dataset encoders need constructor access
  final case class MediaGateState(nSeen: Long, nDropped: Long, highSeq: Long)
  final case class JudgedRecord(docId: Long, source: String, modality: String,
      verdict: String, seq: Long)

  /** The q200 image ladder over the real header parse. */
  def imageVerdict(payload: Array[Byte], minSide: Int = 32): String = {
    val m = Multimodal.imageMeta(payload)
    if (m == null) "rejected"
    else if (math.min(m.width, m.height) < minSide) "too_small"
    else if (math.max(m.width, m.height) > 2L * math.min(m.width, m.height))
      "extreme_aspect"
    else "ok"
  }

  /** The q203 audio ladder over the real sample decode, rate-normalized:
    * clipped ⟺ nClip·1000 ≥ clipPerMille·nSamples (at the fixture's
    * 2048 samples, 24‰ ⟺ the batch nClip ≥ 50 cut exactly). */
  def audioVerdict(payload: Array[Byte], clipAbs: Int = 32000,
      clipPerMille: Int = 24): String = {
    val st = MediaFixture.pcmSampleStats(payload, clipAbs,
      MediaFixture.PcmWindows, 4194304L)
    if (st == null) "rejected"
    else if (st(0) * 1000L >= clipPerMille.toLong * st(4)) "clipped"
    else "ok"
  }

  /** The q206 video ladder over the real AVI demux (duration floor +
    * temporal-activity motion metric — summed |Δ| of consecutive
    * sampled frames' grid sums, normalized per frame pair). Same
    * constants and precedence as the batch census: rejected >
    * too_short > high_motion > ok. */
  def videoVerdict(payload: Array[Byte], minDurationMs: Long = 600,
      activityPerPair: Long = 31000L): String = {
    val meta = Multimodal.videoMeta(payload)
    val grids = Multimodal.sampleAviFrames(payload,
      MediaFixture.FrameStride, MediaFixture.VideoGrid)
    if (meta == null || grids == null) "rejected"
    else if (meta.durationMs < minDurationMs) "too_short"
    else {
      val activity = grids.sliding(2).collect { case Array(a, b) =>
        a.zip(b).map { case (x, y) => math.abs(y - x) }.sum
      }.sum
      if (activity > activityPerPair * (grids.length - 1)) "high_motion"
      else "ok"
    }
  }

  /** @param fenced optional counter for redeliveries caught by the seq
    *   fence — zero under clean delivery (rate gauge only, never
    *   correctness: accumulators over-count under task retry). */
  def verdicts(records: Dataset[MediaRecord],
      fenced: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[MediaVerdict] = {
    val spark = records.sparkSession
    import spark.implicits._
    // map-side adjudication: the payload dies here, in the scan stage.
    // Routing matches modalities EXPLICITLY (r15 ADVICE): a typoed or
    // unknown modality gets the distinct "unroutable" verdict — still
    // counted as dropped, but visible in the census as a MANIFEST
    // problem rather than silently adjudicated (and near-certainly
    // rejected) by the image ladder, which would disguise a routing
    // bug as a media-quality bug.
    val judged = records.map { r =>
      val v = r.modality match {
        case "image" => imageVerdict(r.payload)
        case "audio" => audioVerdict(r.payload)
        case "video" => videoVerdict(r.payload)
        case _       => "unroutable"
      }
      JudgedRecord(r.docId, r.source, r.modality, v, r.seq)
    }
    judged.groupByKey(r => (r.source, r.modality))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (key: (String, String), it: Iterator[JudgedRecord],
         st: GroupState[MediaGateState]) =>
          val st0 = st.getOption.getOrElse(MediaGateState(0L, 0L, Long.MinValue))
          var seen = st0.nSeen
          var dropped = st0.nDropped
          var high = st0.highSeq
          // seq order = delivery order: deterministic under Spark's
          // unordered group iterator
          val out = it.toArray.sortBy(_.seq).map { r =>
            if (r.seq <= high) { // redelivery: census untouched
              fenced.foreach(_.add(1L))
              MediaVerdict(r.docId, key._1, key._2, r.verdict,
                seen, dropped, redelivered = true, r.seq)
            } else {
              high = r.seq
              seen += 1
              if (r.verdict != "ok") dropped += 1
              MediaVerdict(r.docId, key._1, key._2, r.verdict,
                seen, dropped, redelivered = false, r.seq)
            }
          }
          st.update(MediaGateState(seen, dropped, high))
          out.iterator
      }
  }
}
