package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SCD Type-2 dimension maintenance as a live stream — the streaming
  * twin of q144: each user's activity tier is tracked as the events
  * arrive, and a version row is emitted THE MOMENT a change closes it
  * (valid_to = the first event of the successor version), instead of by
  * re-windowing the whole event log. This is the "dimension table kept
  * current by the pipeline" pattern: the batch query rebuilds history,
  * the stream appends to it — same rows, same numbering.
  *
  * State model: one record per user — the open version (tier,
  * valid_from, event count) plus its version number. An arriving event
  * either extends the open version (same tier) or closes it (emit, open
  * the successor). Versions close only on CHANGE, never on time, so
  * there is no timeout: the open version per user stays in state —
  * user-cardinality bound, exactly q144's `is_current` rows. At 100 TB
  * the same code runs keyed-state-distributed on one user_id shuffle —
  * the batch query's single exchange.
  *
  * Ordering: per-batch per-user events fold in (ts, event_id) order —
  * in-order arrival reproduces q144 bit-for-bit (StreamingScd2Spec
  * asserts exact parity). A cross-batch late event with a DIFFERENT tier
  * would mint a version the batch rebuild would not; that is the
  * documented streaming-emission tradeoff, bounded by the source's
  * delivery order (the reference pipelines assume per-key in-order
  * delivery from the partitioned transports for the same reason).
  */
object StreamingScd2 {

  /** Reuses the sessionizer's event shape: `cents` is the exact
    * 2-decimal value ×100, so tier boundaries compare on integers. */
  import StreamingSessionize.SessionEvent

  final case class ClosedVersion(user_id: Long, version: Long, tier: String,
      valid_from_us: Long, valid_to_us: Long, n_events: Long)

  // public: GroupState encoders need constructor access
  final case class OpenVersion(version: Long, tier: String,
      validFromUs: Long, nEvents: Long)

  /** q144's tier rule on exact cents: ≥300.00 high, ≥100.00 mid. */
  private[streaming] def tierOf(cents: Long): String =
    if (cents >= 30000L) "high" else if (cents >= 10000L) "mid" else "low"

  def versions(events: Dataset[SessionEvent]): Dataset[ClosedVersion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[SessionEvent], state: GroupState[OpenVersion]) =>
          var open = state.getOption
          var closed = List.empty[ClosedVersion]
          rows.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
            val t = tierOf(e.cents)
            open match {
              case Some(o) if o.tier == t =>
                open = Some(o.copy(nEvents = o.nEvents + 1))
              case Some(o) =>
                closed ::= ClosedVersion(uid, o.version, o.tier,
                  o.validFromUs, e.us, o.nEvents)
                open = Some(OpenVersion(o.version + 1, t, e.us, 1L))
              case None =>
                open = Some(OpenVersion(1L, t, e.us, 1L))
            }
          }
          open.foreach(state.update)
          closed.reverse.iterator
      }
  }
}
