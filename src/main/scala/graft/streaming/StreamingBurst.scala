package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Trailing-window burst detection as a live stream — the streaming twin
  * of q154: each event type's hourly volume is judged against its
  * trailing 24-hour baseline, and the verdict row for hour H is emitted
  * once the watermark passes H's end — the alert fires minutes after
  * the hour closes, not on tomorrow's batch run.
  *
  * State model: one record per event type — the open hourly counts (a
  * map of hour → count, pruned to the 25 hours the next verdict can
  * still reference) plus the next hour awaiting judgment. Arriving
  * events bump their hour's count; an EVENT-TIME TIMEOUT at the open
  * hour's close (plus watermark slack) emits every closed hour's
  * verdict in order, including empty-baseline hours the batch query
  * also reports. Verdicts are the same integer cross-multiply as q154
  * (cnt·n_trailing ≥ 2·trailing_sum, 12-hour warm-up), so streamed rows
  * equal the batch rows exactly (StreamingBurstSpec).
  *
  * Scale: state is |types| × ≤25 hour buckets — constant per key; the
  * shuffle is the same event_type hash exchange the batch aggregate
  * uses. Hours with zero events for a type produce no verdict row,
  * matching the batch's sparse (type, hour) grain.
  */
object StreamingBurst {

  import StreamingSessionize.SessionEvent

  final case class HourVerdict(event_type: String, hour: Long, cnt: Long,
      trailing_sum: Long, n_trailing: Long, is_burst: Boolean)

  // public: GroupState encoders need constructor access
  final case class TypeState(counts: Map[Long, Long], nextEmit: Long)

  /** micros since the q154 epoch anchor (2024-01-01T00:00:00Z). */
  private val AnchorUs = 1704067200000000L
  private val HourUs = 3600000000L

  private def verdicts(et: String, st: TypeState, upto: Long): (TypeState, List[HourVerdict]) = {
    // a pre-data or pre-first-hour watermark closes nothing — and must
    // not clobber nextEmit (the initial watermark is epoch 0, far
    // before the anchor)
    if (upto <= st.nextEmit) return (st, Nil)
    var out = List.empty[HourVerdict]
    val counts = st.counts
    var h = st.nextEmit
    while (h < upto) {
      counts.get(h).foreach { cnt =>
        val trailing = counts.view.filterKeys(k => k >= h - 24 && k <= h - 1)
        val tSum = trailing.values.sum
        val tN = trailing.size.toLong
        out ::= HourVerdict(et, h, cnt, tSum, tN,
          tN >= 12 && cnt * tN >= 2 * tSum)
      }
      h += 1
    }
    // retain only what future verdicts can reference: hours ≥ upto − 24
    (TypeState(counts.filter { case (k, _) => k >= upto - 24 }, upto), out.reverse)
  }

  /** foreachBatch hook routing burst verdicts onto the ops surface the
    * reference's dashboard exposes (the StreamingIvfIngest drift-alert
    * pattern): every `is_burst` row records an alert the StatsServer
    * `/detail/` drill-down renders. Burst rows are alert-sized — the
    * collect is bounded by flagged (type, hour) cells, not traffic. */
  def alertHook(listener: PipelineStatsListener, query: String)
      : (Dataset[HourVerdict], Long) => Unit = { (ds, _) =>
    ds.filter(_.is_burst).collect().foreach { v =>
      listener.recordDeadLetter(query, graft.pipeline.DeadLetter(
        id = s"burst-${v.event_type}-${v.hour}",
        contentJson =
          s"""{"event_type":"${v.event_type}","hour":${v.hour},"cnt":${v.cnt},""" +
            s""""trailing_sum":${v.trailing_sum},"n_trailing":${v.n_trailing}}""",
        errorMessage =
          s"traffic burst: ${v.event_type} hour ${v.hour} saw ${v.cnt} events " +
            s"vs trailing sum ${v.trailing_sum} over ${v.n_trailing} hours",
        stackTrace = "",
        operator = "StreamingBurst"))
    }
  }

  /** @param events the raw stream (`us` = event-time micros)
    * @param delaySec watermark slack for late arrivals */
  def bursts(events: Dataset[SessionEvent], delaySec: Long = 60): Dataset[HourVerdict] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", s"$delaySec seconds")
      .as[(Long, Long, Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._4)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (et: String, rows: Iterator[(Long, Long, Long, String, Long, java.sql.Timestamp)],
         state: GroupState[TypeState]) =>
          // hours whose end the watermark has passed are closed
          val closedUpto =
            (state.getCurrentWatermarkMs * 1000L - AnchorUs) / HourUs
          if (state.hasTimedOut) {
            val (st2, out) = verdicts(et, state.get, closedUpto)
            state.update(st2)
            // open hours remain → arm the next close
            if (st2.counts.keys.exists(_ >= st2.nextEmit))
              state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs + 1,
                (st2.nextEmit + 1) * (HourUs / 1000L) + AnchorUs / 1000L +
                  delaySec * 1000L))
            out.iterator
          } else {
            var st = state.getOption.getOrElse(TypeState(Map.empty, Long.MaxValue))
            rows.foreach { e =>
              val h = (e._3 - AnchorUs) / HourUs
              st = TypeState(st.counts.updated(h, st.counts.getOrElse(h, 0L) + 1L),
                math.min(st.nextEmit, h))
            }
            val (st2, out) = verdicts(et, st, closedUpto)
            state.update(st2)
            if (st2.counts.keys.exists(_ >= st2.nextEmit))
              state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs + 1,
                (st2.nextEmit + 1) * (HourUs / 1000L) + AnchorUs / 1000L +
                  delaySec * 1000L))
            out.iterator
          }
      }
  }
}
