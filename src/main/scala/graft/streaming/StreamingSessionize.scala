package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization as a live stream — the streaming twin of
  * q137: a user's session closes when no event arrives within the gap,
  * and the closed-session record is emitted AS THE STREAM RUNS (the
  * dashboard row appears ~gap after the user goes quiet) instead of by
  * re-scanning the event log.
  *
  * State model: one record per user — the running session counter plus
  * the currently open session (bounds, event count, distinct types,
  * exact cents total). Arriving events extend the open session or close
  * it (emit + open the next); the LAST session of a quiet user closes
  * via EVENT-TIME TIMEOUT — the watermark passing `end + gap` invokes
  * the function with `hasTimedOut`, so emission needs no poke from a
  * later event. State is user-cardinality bound (the counter survives
  * the open session so `sess_idx` numbering matches the batch replay);
  * at 100 TB the same code runs keyed-state-distributed, one shuffle on
  * user_id — exactly the batch query's exchange.
  *
  * Exactness: values carry as integer cents (the corpus has 2-decimal
  * money, q137 sums DECIMAL(18,2)); both engines' final division of the
  * same exact rational by 100 is the same correctly-rounded double, so
  * the streaming rows equal the batch rows bit-for-bit.
  *
  * Ordering: each micro-batch's per-user events are sorted by
  * (ts, event_id) before folding — in-order arrival (within watermark
  * slack inside one batch) reproduces q137 exactly. A cross-batch
  * regression (an event older than the open session's end, admitted by
  * the watermark) still lands in the open session when within the gap
  * of the latest end; its disorder cannot re-open an already-emitted
  * session — the price of streaming emission, bounded by the watermark
  * delay.
  */
object StreamingSessionize {

  final case class SessionEvent(user_id: Long, event_id: Long, us: Long,
      event_type: String, cents: Long)

  final case class ClosedSession(user_id: Long, sess_idx: Long, start_us: Long,
      end_us: Long, duration_sec: Long, n_events: Long, n_types: Long,
      total_value: Double)

  // public: GroupState encoders need constructor access
  final case class Open(startUs: Long, endUs: Long, nEvents: Long,
      types: Seq[String], cents: Long)
  final case class UserState(nextIdx: Long, open: Option[Open])

  private def close(uid: Long, idx: Long, o: Open): ClosedSession =
    ClosedSession(uid, idx, o.startUs, o.endUs,
      (o.endUs - o.startUs) / 1000000L, o.nEvents, o.types.size.toLong,
      o.cents / 100.0)

  /** @param events the raw stream (`us` = event-time micros)
    * @param gapSec session inactivity gap (q137 uses 1800)
    * @param delaySec watermark slack for late arrivals */
  def sessions(events: Dataset[SessionEvent], gapSec: Long = 1800,
      delaySec: Long = 60): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSec * 1000000L
    // the watermarked `ts` column must survive INTO the stateful
    // operator (a map that drops it severs the event-time lineage and
    // EventTimeTimeout is rejected) — so the grouping runs on the
    // tuple-with-ts and the fold converts inline
    events
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", s"$delaySec seconds")
      .as[(Long, Long, Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, Long, Long, String, Long, java.sql.Timestamp)],
         state: GroupState[UserState]) =>
          val it = rows.map(t => SessionEvent(t._1, t._2, t._3, t._4, t._5))
          if (state.hasTimedOut) {
            val st = state.get
            val out = st.open.map(o => close(uid, st.nextIdx, o)).toList
            // keep the counter: a returning user continues the numbering
            state.update(UserState(st.nextIdx + (if (st.open.isDefined) 1 else 0), None))
            out.iterator
          } else {
            var st = state.getOption.getOrElse(UserState(1L, None))
            var closed = List.empty[ClosedSession]
            it.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
              st.open match {
                case Some(o) if e.us - o.endUs <= gapUs =>
                  st = st.copy(open = Some(Open(
                    math.min(o.startUs, e.us), math.max(o.endUs, e.us),
                    o.nEvents + 1,
                    if (o.types.contains(e.event_type)) o.types
                    else o.types :+ e.event_type,
                    o.cents + e.cents)))
                case Some(o) =>
                  closed ::= close(uid, st.nextIdx, o)
                  st = UserState(st.nextIdx + 1,
                    Some(Open(e.us, e.us, 1L, Seq(e.event_type), e.cents)))
                case None =>
                  st = st.copy(open =
                    Some(Open(e.us, e.us, 1L, Seq(e.event_type), e.cents)))
              }
            }
            state.update(st)
            st.open.foreach { o =>
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs + 1,
                  o.endUs / 1000L + gapSec * 1000L))
            }
            closed.reverse.iterator
          }
      }
  }
}
