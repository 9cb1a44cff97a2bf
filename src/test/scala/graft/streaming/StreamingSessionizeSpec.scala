package graft.streaming

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming sessionizer must emit, after the watermark passes every
  * open gap, EXACTLY the rows q137 computes from the same event log —
  * same numbering, same integer bounds, same value doubles. */
class StreamingSessionizeSpec extends SparkSpecBase {
  import spark.implicits._
  import StreamingSessionize.SessionEvent

  private def orderedEvents(): Seq[SessionEvent] =
    Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => SessionEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), math.round(r.getDouble(4) * 100)))
      .sortBy(e => (e.us, e.event_id)).toSeq

  test("closed sessions equal the q137 batch rows on the same log") {
    val evs = orderedEvents()
    val input = MemoryStream[SessionEvent](spark)
    val out = StreamingSessionize.sessions(input.toDS(), gapSec = 1800, delaySec = 1)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      val third = evs.size / 3
      evs.grouped(math.max(third, 1)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      // two far-future sentinel batches: the first advances the
      // watermark past every open gap, the second gives the timeout a
      // batch to fire in
      val far = evs.map(_.us).max + 86400L * 1000000L
      input.addData(Seq(SessionEvent(-1L, 0L, far, "x", 0L)))
      q.processAllAvailable()
      input.addData(Seq(SessionEvent(-1L, 1L, far + 1000000L, "x", 0L)))
      q.processAllAvailable()

      val got = spark.table("sess_out")
        .where(col("user_id") >= 0)
        .select("user_id", "sess_idx", "start_us", "end_us", "duration_sec",
          "n_events", "n_types", "total_value")
        .as[(Long, Long, Long, Long, Long, Long, Long, Double)]
        .collect().toSeq.sortBy(t => (t._1, t._2))
      val want = graft.queries.Analytics.q137.run(spark, sfDir)
        .as[(Long, Long, Long, Long, Long, Long, Long, Double)]
        .collect().toSeq.sortBy(t => (t._1, t._2))
      assert(got.size == want.size,
        s"session count: streaming ${got.size} vs batch ${want.size}")
      assert(got == want)
    } finally q.stop()
  }
}
