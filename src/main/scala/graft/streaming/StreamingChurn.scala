package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live corpus-churn monitor — the streaming twin of q166: instead of
  * reconciling two finished snapshots with a full-outer join, the
  * re-crawl RECORD STREAM is classified as it arrives. Each document's
  * last content fingerprint lives in keyed state; an arriving record is
  * `added` (no live fingerprint), `changed` (fingerprint differs),
  * `unchanged` (same), or `removed` (a tombstone — `fp = None` — from
  * the crawler's gone-from-the-web signal). The verdict stream feeds
  * the same per-source churn census q166 reports, while the state table
  * IS the living snapshot.
  *
  * Scale: state is one (doc_id → 32-char fp + 8-byte seq) entry per
  * OBSERVED document, keyed and distributed on the same doc_id the
  * batch join shuffles on. No text rides the stream: fingerprints are
  * computed upstream, map-side, by the ingest stage (the q166
  * projection discipline). A removed document keeps a tombstone entry
  * (fp absent, seq retained) — the fence that makes redelivery safe
  * below; remove-heavy corpora bound it inline with the
  * `tombstoneRetentionMs` compaction (drop tombstones idle past the
  * source's replay horizon) or the q156-style offline erasure pass.
  *
  * At-least-once: every observation carries a monotone `seq` (crawl
  * sequence number), and the state keeps the high-water seq. A
  * redelivered record — in the same batch or many batches later —
  * carries a seq at or below the high-water mark and is DROPPED without
  * a verdict, so duplicate delivery can never double-count any status
  * and a stale pre-tombstone record cannot resurrect a removed doc.
  * A NEW tombstone for an already-absent doc classifies `unchanged`
  * (absent → absent), mirroring the batch diff, which has no verdict
  * for never-present documents.
  */
object StreamingChurn {

  /** One re-crawl observation; `fp` None = tombstone. `seq` is the
    * crawl sequence number — strictly increasing per doc across
    * genuine observations, repeated only on redelivery. */
  final case class CrawlRecord(doc_id: Long, source: String,
      fp: Option[String], seq: Long)

  final case class ChurnVerdict(doc_id: Long, source: String,
      status: String, seq: Long)

  // public: GroupState encoders need constructor access
  final case class DocState(fp: Option[String], seq: Long)

  /** @param fenced optional counter for records dropped by the seq
    *   fence — zero under clean delivery, so a nonzero rate IS the
    *   upstream-replay-storm signal; wire it to the ops dashboard the
    *   way StreamingBurst wires its alerts. Accumulators are
    *   at-least-once under task retry (may over-count on retry) —
    *   fine for a rate gauge, never used for correctness.
    * @param tombstoneRetentionMs opt-in TOMBSTONE compaction: a removed
    *   doc's entry drops from state once it has been idle this long
    *   (processing-time timeout). The fence only has to cover the
    *   source's replay horizon (e.g. Kinesis' bounded stream retention
    *   — replays older than the horizon cannot arrive), so set this ≥
    *   that horizon and the state bound becomes |live docs| +
    *   |tombstones inside the horizon| instead of growing with every
    *   doc ever removed. Documented degrade past the horizon: a
    *   stale pre-tombstone redelivery arriving AFTER compaction is no
    *   longer fenced and resurrects the doc as `added` — exactly the
    *   batch q166 semantics against a compacted snapshot. LIVE entries
    *   never expire (they are the living snapshot); they just re-arm.
    *   Operational note: with retention on, the engine keeps scheduling
    *   timeout-sweep micro-batches (`shouldRunAnotherBatch` is always
    *   true under ProcessingTimeTimeout), so pace the query with a real
    *   `Trigger.ProcessingTime` and drive tests by polling the sink —
    *   `processAllAvailable()` waits for a no-batch signal the sweep
    *   loop never gives and would block forever. */
  def verdicts(records: Dataset[CrawlRecord],
      fenced: Option[org.apache.spark.util.LongAccumulator] = None,
      tombstoneRetentionMs: Option[Long] = None): Dataset[ChurnVerdict] = {
    val spark = records.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (tombstoneRetentionMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    records
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (id: Long, rows: Iterator[CrawlRecord], state: GroupState[DocState]) =>
          if (tombstoneRetentionMs.isDefined && state.hasTimedOut) {
            // idle past the replay horizon: tombstones compact away;
            // live snapshots re-arm and stay
            if (state.getOption.exists(_.fp.isEmpty)) state.remove()
            else tombstoneRetentionMs.foreach(state.setTimeoutDuration)
            Iterator.empty
          } else {
            var cur = state.getOption
            val out = rows.toSeq.sortBy(_.seq).flatMap { r =>
              if (cur.exists(r.seq <= _.seq)) {
                fenced.foreach(_.add(1L)) // redelivery: fenced, no verdict
                None
              }
              else {
                val status = (cur.flatMap(_.fp), r.fp) match {
                  case (None, Some(_))                 => "added"
                  case (Some(_), None)                 => "removed"
                  case (None, None)                    => "unchanged" // absent → absent
                  case (Some(s), Some(f)) if s == f    => "unchanged"
                  case _                               => "changed"
                }
                cur = Some(DocState(r.fp, r.seq))
                Some(ChurnVerdict(id, r.source, status, r.seq))
              }
            }
            cur.foreach(state.update)
            if (state.exists) tombstoneRetentionMs.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
