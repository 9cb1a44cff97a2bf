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
  * (StreamingAttributionSpec). A click arriving AFTER the purchase it
  * should have preceded (cross-batch disorder) is the same
  * late-arrival tradeoff the sessionizer documents — bounded by the
  * source's per-key ordering guarantee.
  */
object StreamingAttribution {

  import StreamingSessionize.SessionEvent

  /** One purchase's attribution facts: enough to rebuild q160 (via
    * `attributed` = n_touches > 0 and the purchase day) and q162 (via
    * the in-window click ids/times carried as parallel sequences). */
  final case class Attribution(user_id: Long, p_id: Long, p_us: Long,
      cents: Long, n_touches: Long, last_click_us: Long,
      touch_ids: Seq[Long], touch_us: Seq[Long])

  final case class ClickWindow(ids: Seq[Long], us: Seq[Long])

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
            // who browse forever and never buy
            val keep = w.us.zipWithIndex.filter { case (u, _) =>
              e.us - u <= LookbackUs && u <= e.us
            }.map(_._2)
            w = ClickWindow(keep.map(w.ids), keep.map(w.us))
            if (e.event_type == "click") {
              w = ClickWindow(w.ids :+ e.event_id, w.us :+ e.us)
            } else if (e.event_type == "purchase") {
              out ::= Attribution(uid, e.event_id, e.us, e.cents,
                w.ids.size.toLong,
                if (w.us.isEmpty) Long.MinValue else w.us.max,
                w.ids, w.us)
            }
          }
          state.update(w)
          out.reverse.iterator
      }
  }
}
