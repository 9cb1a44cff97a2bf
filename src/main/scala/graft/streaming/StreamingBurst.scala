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
  * map of hour → count) plus `emittedUpto`, the monotonic judgment
  * frontier (every hour < emittedUpto has had its verdict emitted; it
  * never rewinds, so a late event below it can never cause a duplicate
  * verdict row). Arriving events bump their hour's count; an EVENT-TIME
  * TIMEOUT at the first open hour's close (plus watermark slack) emits
  * every closed hour's verdict in order, including empty-baseline hours
  * the batch query also reports. Verdicts are the same integer
  * cross-multiply as q154 (cnt·n_trailing ≥ 2·trailing_sum, 12-hour
  * warm-up), so streamed rows equal the batch rows exactly
  * (StreamingBurstSpec).
  *
  * Scale: state is |types| × ≤~49 hour buckets even MID-BACKFILL: hours
  * are closed not only by watermark advance between batches but also at
  * fold time, as soon as they fall 24 hours behind the key's newest
  * event — a single batch spanning months of history emits its verdicts
  * and prunes inside that same fold, so the claim holds per batch, not
  * just at micro-batch steady state. (The fold-time close assumes
  * per-key disorder stays under 24 hours — far looser than the
  * watermark slack; an event arriving later than that lands below
  * `emittedUpto` and is dropped at the next prune, never duplicating or
  * rewriting an emitted verdict.) The shuffle is the same event_type
  * hash exchange the batch aggregate uses. Hours with zero events for a
  * type produce no verdict row, matching the batch's sparse
  * (type, hour) grain.
  */
object StreamingBurst {

  import StreamingSessionize.SessionEvent

  final case class HourVerdict(event_type: String, hour: Long, cnt: Long,
      trailing_sum: Long, n_trailing: Long, is_burst: Boolean)

  // public: GroupState encoders need constructor access
  /** CHECKPOINT COMPATIBILITY: round 9 renamed `nextEmit` →
    * `emittedUpto` AND inverted the empty-state sentinel
    * (Long.MaxValue → Long.MinValue) — old state decoded under the new
    * layout would be semantically inverted, so the rename is load-
    * bearing: a pre-change checkpoint fails state-schema validation on
    * restart instead (TopologyEvolutionSpec pins that posture).
    * Migrate via a fresh checkpoint + source replay. */
  final case class TypeState(counts: Map[Long, Long], emittedUpto: Long)

  /** micros since the q154 epoch anchor (2024-01-01T00:00:00Z). */
  private val AnchorUs = 1704067200000000L
  private val HourUs = 3600000000L

  /** Forced-close distrust horizon once the watermark is live: a batch's
    * max event time may legitimately run ahead of the watermark by a
    * backfill chunk's span, but not by years — beyond this, the "newest
    * event" driving the forced close is treated as corrupt and the
    * close is bounded to watermark + horizon. Residual, by design: the
    * clamped close can still advance the key's frontier up to one
    * horizon past the watermark, suppressing verdicts for that span —
    * but a corrupt timestamp also poisons Spark's OWN watermark on the
    * next batch, so every event in that span is already dropped
    * engine-wide before reaching this fold; the clamp adds no
    * suppression the engine doesn't, it only bounds this operator's
    * work and frontier. True protection is input validation upstream. */
  private val ForcedCloseMaxAheadHours = 24L * 120L
  /** Hard cap on hours walked per verdicts() call — bounded fold work
    * no matter what bound the caller derived; the remainder closes in
    * later folds/timeouts. */
  private val MaxEmitHoursPerFold = 100000L

  private def verdicts(et: String, st: TypeState, uptoRaw: Long): (TypeState, List[HourVerdict]) = {
    var out = List.empty[HourVerdict]
    val counts = st.counts
    // judge only open hours (≥ emittedUpto); buckets below the frontier
    // are trailing baseline or late strays, never re-judged
    val open = counts.keys.filter(_ >= st.emittedUpto)
    // per-call span cap: the walk below is hour-by-hour and uptoRaw can
    // be driven by a single far-future timestamp — never walk (or jump
    // the frontier) more than MaxEmitHoursPerFold past the oldest open
    // hour in one call
    val upto =
      if (open.isEmpty) uptoRaw
      else math.min(uptoRaw, open.min + MaxEmitHoursPerFold)
    // the frontier never rewinds: a pre-data watermark (epoch 0 maps to
    // a large negative hour) or a stale forced-close bound emits nothing
    if (upto <= st.emittedUpto) return (st, Nil)
    if (open.nonEmpty) {
      var h = open.min
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
    }
    // retain only what future verdicts can reference: hours ≥ upto − 24
    (TypeState(counts.filter { case (k, _) => k >= upto - 24 }, upto), out.reverse)
  }

  /** foreachBatch hook routing burst verdicts onto the ops surface the
    * reference's dashboard exposes (the StreamingIvfIngest drift-alert
    * pattern): every `is_burst` row records an alert the StatsServer
    * `/detail/` drill-down renders.
    *
    * BOUNDED DRIVER COLLECT (the LiveClusterIndex discipline): the
    * collect below is bounded by |flagged (event_type, hour) cells| in
    * THIS micro-batch — at most |event types| × |hours the batch
    * closed|, independent of event traffic (a burst hour contributes
    * ONE row however many million events it holds). That is alert
    * grain, the same cardinality a pager would carry, so it belongs on
    * the driver: the listener's stats registry is driver-resident by
    * design. If a deployment ever had unbounded type cardinality, the
    * upstream q154 grain itself is the thing to cap (top-K types by
    * volume), not this hook — an alert surface with a million rows is
    * operationally meaningless before it is a memory problem. */
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
          def armTimeout(st2: TypeState): Unit = {
            val open = st2.counts.keys.filter(_ >= st2.emittedUpto)
            if (open.nonEmpty)
              state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs + 1,
                (open.min + 1) * (HourUs / 1000L) + AnchorUs / 1000L +
                  delaySec * 1000L))
          }
          if (state.hasTimedOut) {
            val (st2, out) = verdicts(et, state.get, closedUpto)
            state.update(st2)
            armTimeout(st2) // open hours remain → arm the next close
            out.iterator
          } else {
            var st = state.getOption.getOrElse(TypeState(Map.empty, Long.MinValue))
            var maxH = Long.MinValue
            rows.foreach { e =>
              val h = (e._3 - AnchorUs) / HourUs
              maxH = math.max(maxH, h)
              st = st.copy(counts = st.counts.updated(h, st.counts.getOrElse(h, 0L) + 1L))
            }
            // fold-time forced close: a backfill batch spanning many
            // hours judges and prunes everything >24h behind its own
            // newest event NOW, instead of holding it until the
            // watermark catches up between batches. maxH is ONE event's
            // hour, so once the watermark is live it is distrusted
            // beyond the backfill horizon — a corrupt far-future
            // timestamp must not drive the close (and the frontier)
            // years ahead of the watermark
            val saneMaxH =
              if (state.getCurrentWatermarkMs > 0)
                math.min(maxH, closedUpto + ForcedCloseMaxAheadHours)
              else maxH // first fold: no watermark signal yet; the
                        // per-call span cap in verdicts() still bounds work
            val upto = math.max(closedUpto,
              if (maxH == Long.MinValue) closedUpto else saneMaxH - 24)
            val (st2, out) = verdicts(et, st, upto)
            state.update(st2)
            armTimeout(st2)
            out.iterator
          }
      }
  }
}
