package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Event-time semantics the reference lacks entirely (SURVEY.md §1.3 —
  * "no event time, no watermarks"): watermarked tumbling windows with
  * late-data handling, and session windows — the streaming twins of
  * q16_hourly_agg / q18_sessionize.
  */
class EventTimeSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("watermarked tumbling window aggregates and drops too-late data") {
    val input = MemoryStream[(Timestamp, String, Double)](spark, 2)
    val agg = input.toDS().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("v"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Update).start()

    input.addData(Seq(
      (ts(0, 10), "click", 1.0), (ts(1, 0), "click", 2.0),   // window 10:00
      (ts(6, 30), "click", 4.0),                              // window 10:05
      (ts(2, 0), "view", 8.0)))                               // window 10:00
    q.processAllAvailable()
    // advance watermark far past the first windows
    input.addData(Seq((ts(40, 0), "click", 16.0)))
    q.processAllAvailable()
    // this event is > 10 min behind the watermark -> dropped
    input.addData(Seq((ts(1, 30), "click", 999.0)))
    q.processAllAvailable()

    val rows = spark.table("win_out")
      .groupBy("wstart", "event_type").agg(max("n").as("n"), max("v").as("v"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 10:05:00.0", "click", 1L, 4.0)))
    assert(rows.contains(("2024-01-01 10:00:00.0", "view", 1L, 8.0)))
    // the late 999.0 never lands anywhere
    assert(!spark.table("win_out").collect().exists(_.getDouble(3) == 999.0))
    q.stop()
  }

  test("session window closes after the gap and splits sessions") {
    val input = MemoryStream[(Timestamp, Long)](spark, 2)
    val agg = input.toDS().toDF("ts", "user_id")
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()

    // user 7: two bursts separated by > 5 minutes -> two sessions (3 + 2)
    input.addData(Seq((ts(0), 7L), (ts(1), 7L), (ts(2), 7L), (ts(20), 7L), (ts(21), 7L)))
    q.processAllAvailable()
    input.addData(Seq((ts(59), 99L))) // advance watermark to close sessions
    q.processAllAvailable()

    val sessions = spark.table("sess_out").where(col("user_id") === 7)
      .select("n").as[Long].collect().sorted.toSeq
    assert(sessions == Seq(2L, 3L))
    q.stop()
  }

  test("hopping window assigns each event to both overlapping hops (q86 twin)") {
    val input = MemoryStream[(Timestamp, Double)](spark, 2)
    val agg = input.toDS().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("window.start").as("wstart"), col("n"), col("v"))
    val q = agg.writeStream.format("memory").queryName("hop_out")
      .outputMode(OutputMode.Update).start()

    // one event at 10:07 -> hops [10:00,10:10) and [10:05,10:15)
    input.addData(Seq((ts(7, 0), 3.0)))
    q.processAllAvailable()

    val rows = spark.table("hop_out")
      .groupBy("wstart").agg(max("n").as("n"), max("v").as("v"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set(
      ("2024-01-01 10:00:00.0", 1L, 3.0),
      ("2024-01-01 10:05:00.0", 1L, 3.0)))
    q.stop()
  }
}
