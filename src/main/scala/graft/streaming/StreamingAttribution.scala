package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Click→purchase attribution as a live stream — the streaming twin of
  * q160/q162: each user's clicks are held in keyed state (pruned to the
  * 7-day lookback, so state is bounded by per-user click RATE, not
  * history), and every purchase emits its attribution record the moment
  * it arrives — touch count, last-touch click, and the purchase value —
  * from which both the last-touch daily report (q160) and the linear
  * credit split (q162) derive without rescanning the event log.
  *
  * Ordering: per-batch per-user events fold in (ts, event_id) order, so
  * in-order delivery reproduces the batch queries exactly
  * (StreamingAttributionSpec). Cross-batch disorder is contained: state
  * is pruned only by lookback AGE against a monotonic max-seen
  * timestamp, never by an arriving event's own (possibly stale)
  * timestamp — so a late click can never delete newer clicks from
  * state. The only residual effect of a late click is the documented
  * one: purchases that already emitted before it arrived miss that one
  * touch (bounded by the source's per-key ordering guarantee).
  */
object StreamingAttribution {

  import StreamingSessionize.SessionEvent

  /** One purchase's attribution facts: enough to rebuild q160 (via
    * `attributed` = n_touches > 0 and the purchase day) and q162 (via
    * the in-window click ids/times carried as parallel sequences). */
  final case class Attribution(user_id: Long, p_id: Long, p_us: Long,
      cents: Long, n_touches: Long, last_click_us: Long,
      touch_ids: Seq[Long], touch_us: Seq[Long])

  /** CHECKPOINT COMPATIBILITY: `maxUs` was added in round 9 (the
    * high-water mark the age-only prune works against). A checkpoint
    * written before that change fails state-schema validation on
    * restart — deliberately (TopologyEvolutionSpec pins the loud-
    * rejection behavior); migrate by restarting from a fresh checkpoint
    * and replaying the source. */
  final case class ClickWindow(ids: Seq[Long], us: Seq[Long],
      maxUs: Long = Long.MinValue)

  private val LookbackUs = 604800000000L

  def attributions(events: Dataset[SessionEvent]): Dataset[Attribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[SessionEvent], state: GroupState[ClickWindow]) =>
          var w = state.getOption.getOrElse(ClickWindow(Nil, Nil))
          var out = List.empty[Attribution]
          rows.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
            // prune to the lookback on EVERY event (not just purchases):
            // state stays bounded by 7-day click volume even for users
            // who browse forever and never buy. The prune bound is the
            // monotonic high-water mark, NOT e.us — a late event must
            // never delete clicks newer than itself.
            val hwm = math.max(w.maxUs, e.us)
            val keep = w.us.zipWithIndex.filter { case (u, _) =>
              hwm - u <= LookbackUs
            }.map(_._2)
            w = ClickWindow(keep.map(w.ids), keep.map(w.us), hwm)
            if (e.event_type == "click") {
              w = w.copy(ids = w.ids :+ e.event_id, us = w.us :+ e.us)
            } else if (e.event_type == "purchase") {
              // the "click precedes purchase" bound applies here, at
              // emission — it selects which touches this purchase sees,
              // without mutating state
              val win = w.us.zipWithIndex.filter { case (u, _) =>
                u <= e.us && e.us - u <= LookbackUs
              }.map(_._2)
              val tids = win.map(w.ids); val tus = win.map(w.us)
              out ::= Attribution(uid, e.event_id, e.us, e.cents,
                tids.size.toLong,
                if (tus.isEmpty) Long.MinValue else tus.max,
                tids, tus)
            }
          }
          state.update(w)
          out.reverse.iterator
      }
  }
}
