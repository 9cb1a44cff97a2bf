package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live per-source admission gate — the streaming companion of q163's
  * domain cap: a firehose ingest must bound what any single source can
  * contribute BEFORE paying downstream cost (decode, quality gates,
  * dedup state), so the gate runs on arrival with per-source state.
  *
  * Semantics are deliberately DIFFERENT from q163 and documented as
  * such: an online gate cannot know the corpus-wide hash priority, so
  * it admits the FIRST `cap` arrivals per source in delivery (`seq`)
  * order — the operational pair is this live bound for ingest-cost
  * control plus the nightly q163 run that re-caps the stored corpus
  * exactly and reproducibly. Every document gets a verdict row
  * (admitted or not), so the reject stream is routable to a
  * dead-letter/audit sink like any other gate's.
  *
  * At-least-once: the engine's own sources redeliver (SQS visibility
  * expiry, Kinesis replay after a lease takeover), so every record
  * carries the source's monotone delivery sequence `seq` (the Kinesis
  * per-shard sequence number / the QueueRamp offset — strictly
  * increasing per source across GENUINE deliveries, repeated only on
  * redelivery). State keeps the per-source high-water seq plus the
  * admitted doc_id set (bounded by `cap` entries); a record at or
  * below the high-water mark is a redelivery and RE-EMITS its original
  * verdict — admitted iff its doc_id is in the admitted set — without
  * consuming a slot, so duplicate delivery can neither exhaust the cap
  * early nor flip a verdict. This is the same fence discipline
  * StreamingChurn uses; it assumes in-order first delivery per source
  * (the Kinesis within-shard guarantee), which is what makes "seq ≤
  * high-water ⇒ seen before" sound.
  *
  * Scale: state per source is one long counter, one high-water seq and
  * ≤ `cap` admitted ids (~8·cap bytes) — independent of corpus size;
  * the shuffle is the same source-keyed exchange the batch cap uses;
  * verdicts are append-mode. Admitted sets never expire by default — a
  * cap is a corpus property, not a window property; the opt-in
  * `idleRetentionMs` timeout (below) drops a source's whole entry once
  * it has been idle past the horizon, the q156-style reset, shifting
  * the cap to per-activity-epoch.
  *
  * Note on redelivered verdicts: a fenced record re-emits its original
  * ADMITTED bit (from the admitted set), but its `n_admitted` field
  * carries the CURRENT per-source counter, not a replay of the value at
  * original delivery — the counter is an audit gauge of cap occupancy
  * at emission time, and storing per-record historical counters would
  * grow state past the ~8·cap bound for no fence benefit.
  */
object StreamingSourceCap {

  /** One delivery; `seq` is the source's monotone delivery sequence
    * (repeated only on redelivery — see class doc). */
  final case class CapRecord(doc_id: Long, source: String, seq: Long)

  final case class Verdict(doc_id: Long, source: String, admitted: Boolean,
      n_admitted: Long, redelivered: Boolean)

  // public: GroupState encoders need constructor access
  final case class CapState(nAdmitted: Long, highSeq: Long,
      admitted: Array[Long])

  /** @param records streaming deliveries, seq monotone per source
    * @param cap     max admitted documents per source
    * @param fenced  optional counter for redeliveries caught by the seq
    *   fence — zero under clean delivery, so a nonzero rate IS the
    *   upstream-replay-storm signal (rate gauge only, never
    *   correctness: accumulators over-count under task retry).
    * @param idleRetentionMs opt-in compaction for source-count-unbounded
    *   feeds (per-domain keys over the open web): a source idle this
    *   long has its whole entry dropped (processing-time timeout), so
    *   state is bounded by the sources active inside the horizon.
    *   Documented semantic shift: a source returning after the horizon
    *   draws a FRESH budget — the cap becomes per-activity-epoch rather
    *   than per-corpus (the nightly q163 batch re-cap stays the exact
    *   corpus-wide bound). Set ≥ the delivery replay horizon or an
    *   expired source's redeliveries also re-admit. With retention on,
    *   the engine keeps scheduling timeout-sweep micro-batches — pace
    *   with a real `Trigger.ProcessingTime`, poll the sink in tests;
    *   `processAllAvailable()` would block forever (see
    *   [[StreamingChurn.verdicts]]). */
  def admissions(records: Dataset[CapRecord], cap: Int,
      fenced: Option[org.apache.spark.util.LongAccumulator] = None,
      idleRetentionMs: Option[Long] = None): Dataset[Verdict] = {
    val spark = records.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleRetentionMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    records.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (src: String, it: Iterator[CapRecord], st: GroupState[CapState]) =>
          if (idleRetentionMs.isDefined && st.hasTimedOut) {
            st.remove() // idle past the horizon: budget epoch closes
            Iterator.empty
          } else {
          val st0 = st.getOption.getOrElse(CapState(0L, Long.MinValue, Array.empty))
          var n = st0.nAdmitted
          var high = st0.highSeq
          val admitted = scala.collection.mutable.LongMap.empty[Unit]
          st0.admitted.foreach(admitted.update(_, ()))
          // seq order = delivery order; makes the gate batch-boundary
          // invariant and deterministic under Spark's unordered iterator
          val out = it.toArray.sortBy(_.seq).map { r =>
            if (r.seq <= high) { // redelivery: original verdict, no slot
              fenced.foreach(_.add(1L))
              Verdict(r.doc_id, src, admitted.contains(r.doc_id), n,
                redelivered = true)
            } else {
              high = r.seq
              val admit = n < cap
              if (admit) { n += 1; admitted.update(r.doc_id, ()) }
              Verdict(r.doc_id, src, admit, n, redelivered = false)
            }
          }
          st.update(CapState(n, high, admitted.keys.toArray))
          idleRetentionMs.foreach(st.setTimeoutDuration)
          out.iterator
          }
      }
  }
}
