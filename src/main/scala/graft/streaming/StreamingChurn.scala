package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live corpus-churn monitor — the streaming twin of q166: instead of
  * reconciling two finished snapshots with a full-outer join, the
  * re-crawl RECORD STREAM is classified as it arrives. Each document's
  * last content fingerprint lives in keyed state; an arriving record is
  * `added` (no state), `changed` (fingerprint differs), `unchanged`
  * (same), or `removed` (a tombstone — `fp = None` — from the crawler's
  * gone-from-the-web signal, which also clears the state). The verdict
  * stream feeds the same per-source churn census q166 reports, while the
  * state table IS the living snapshot.
  *
  * Scale: state is one (doc_id → 32-char fp) entry per live document —
  * exactly the size of the snapshot the batch query would scan, keyed
  * and distributed on the same doc_id the batch join shuffles on. No
  * text rides the stream: fingerprints are computed upstream, map-side,
  * by the ingest stage (the q166 projection discipline).
  *
  * At-least-once: replaying an `added`/`changed` record finds the state
  * it wrote and re-classifies as `unchanged` — duplicate deliveries
  * cannot double-count churn. Replaying a tombstone re-emits `removed`
  * with no state (idempotent clear). Census consumers therefore
  * over-count only `unchanged` under replay — the one verdict no
  * downstream pass acts on.
  */
object StreamingChurn {

  /** One re-crawl observation; `fp` None = tombstone. `seq` orders
    * observations of the same doc within a batch (crawl sequence). */
  final case class CrawlRecord(doc_id: Long, source: String,
      fp: Option[String], seq: Long)

  final case class ChurnVerdict(doc_id: Long, source: String,
      status: String, seq: Long)

  // public: GroupState encoders need constructor access
  final case class DocState(fp: String)

  def verdicts(records: Dataset[CrawlRecord]): Dataset[ChurnVerdict] = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (id: Long, rows: Iterator[CrawlRecord], state: GroupState[DocState]) =>
          var cur = state.getOption
          val out = rows.toSeq.sortBy(_.seq).map { r =>
            val status = (cur, r.fp) match {
              case (None, Some(_))                      => "added"
              case (Some(_), None)                      => "removed"
              case (None, None)                         => "removed" // tombstone replay: idempotent
              case (Some(s), Some(f)) if s.fp == f      => "unchanged"
              case _                                    => "changed"
            }
            cur = r.fp.map(DocState)
            ChurnVerdict(id, r.source, status, r.seq)
          }
          cur match {
            case Some(s) => state.update(s)
            case None    => if (state.exists) state.remove()
          }
          out.iterator
      }
  }
}
