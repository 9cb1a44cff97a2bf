package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live crawl-frontier gate — the streaming twin of q169: discovered
  * URLs arrive as a stream, each is canonicalized MAP-SIDE with the
  * exact q169 kernel ([[graft.queries.Curation11.canonUrlExpr]]), and
  * keyed state over the canonical form admits the FIRST arrival
  * (`fetch = true` — this is the copy the fetcher downloads) while
  * every later variant of the same page is a `fetch = false` verdict
  * (routable to the audit/skip sink). The batch q169 census and this
  * gate agree by construction: per source, the number of `fetch`
  * verdicts equals `n_canon_distinct` (StreamingFrontierSpec pins the
  * equivalence on the derived population).
  *
  * At-least-once: `seq` is the discovery stream's monotone delivery
  * sequence (repeated only on redelivery). State keeps the canonical
  * key's first-admitted seq plus the high-water seq; a record at or
  * below the high-water mark is a redelivery and RE-EMITS its original
  * verdict — `fetch` iff its seq IS the stored first-admitted seq —
  * without mutating state, so duplicate delivery can neither re-fetch
  * a page nor flip a verdict (the [[StreamingSourceCap]] fence
  * discipline).
  *
  * Scale: state per canonical URL is two longs + the canonical string
  * (the raw first URL is NOT retained); the shuffle is one exchange
  * keyed on the canonical form — the same key the batch census
  * aggregates on — and canonicalization runs before it, so the
  * exchange never carries un-canonicalized variants as distinct keys.
  * Verdicts are append-mode. Frontier state is long-lived by default (a
  * frontier is a corpus property); for an unbounded URL space opt into
  * `idleRetentionMs` — a canonical URL idle past the horizon drops its
  * entry (processing-time timeout), bounding state to the pages seen
  * inside the horizon. Documented degrade: a variant arriving after its
  * page's entry compacted re-admits (one extra fetch per horizon —
  * exactly a crawler's re-visit policy). With retention on, the engine
  * keeps scheduling timeout-sweep micro-batches: pace the query with a
  * real `Trigger.ProcessingTime` and poll the sink in tests —
  * `processAllAvailable()` would block forever (see
  * [[StreamingChurn.verdicts]]).
  */
object StreamingFrontier {

  /** One discovery; `seq` is the stream's monotone delivery sequence
    * (repeated only on redelivery — see class doc). */
  final case class FrontierRecord(url: String, source: String, seq: Long)

  final case class FrontierVerdict(url: String, canon: String, source: String,
      fetch: Boolean, redelivered: Boolean, seq: Long)

  // public: GroupState encoders need constructor access
  final case class FrontierState(firstSeq: Long, highSeq: Long)

  // public: Dataset encoders generate accessor code for this class
  final case class CanonRecord(url: String, source: String, seq: Long,
      canon: String)

  /** @param fenced optional counter for redeliveries caught by the seq
    *   fence — zero under clean delivery (rate gauge only, never
    *   correctness: accumulators over-count under task retry).
    * @param idleRetentionMs opt-in compaction for unbounded URL spaces:
    *   a canonical URL idle this long drops its entry, so state is
    *   bounded by the pages active inside the horizon; a post-horizon
    *   variant re-admits (one extra fetch per horizon — the re-visit
    *   degrade). Set ≥ the delivery replay horizon or an expired page's
    *   redeliveries also re-fetch. See the class doc's pacing note. */
  def verdicts(records: Dataset[FrontierRecord],
      fenced: Option[org.apache.spark.util.LongAccumulator] = None,
      idleRetentionMs: Option[Long] = None): Dataset[FrontierVerdict] = {
    val spark = records.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleRetentionMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    records
      .withColumn("canon", graft.queries.Curation11.canonUrlExpr(col("url")))
      .as[CanonRecord]
      .groupByKey(_.canon)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (canon: String, it: Iterator[CanonRecord], st: GroupState[FrontierState]) =>
          if (idleRetentionMs.isDefined && st.hasTimedOut) {
            st.remove() // idle past the horizon: the page may re-fetch
            Iterator.empty
          } else {
          val st0 = st.getOption.getOrElse(FrontierState(Long.MinValue, Long.MinValue))
          var firstSeq = st0.firstSeq
          var high = st0.highSeq
          // seq order = delivery order: batch-boundary invariant and
          // deterministic under Spark's unordered group iterator
          val out = it.toArray.sortBy(_.seq).map { r =>
            if (r.seq <= high) { // redelivery: original verdict, no state change
              fenced.foreach(_.add(1L))
              FrontierVerdict(r.url, canon, r.source,
                fetch = r.seq == firstSeq, redelivered = true, r.seq)
            } else {
              high = r.seq
              val first = firstSeq == Long.MinValue
              if (first) firstSeq = r.seq
              FrontierVerdict(r.url, canon, r.source,
                fetch = first, redelivered = false, r.seq)
            }
          }
          st.update(FrontierState(firstSeq, high))
          idleRetentionMs.foreach(st.setTimeoutDuration)
          out.iterator
          }
      }
  }
}
