package graft.streaming

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streamed attribution records must reproduce both batch reports:
  * aggregated by purchase day they equal q160's last-touch table, and
  * the q162 credit rule applied to the carried touch lists conserves
  * and matches q162's daily credit table exactly. */
class StreamingAttributionSpec extends SparkSpecBase {
  import spark.implicits._
  import StreamingSessionize.SessionEvent

  test("streamed purchases rebuild q160 and q162 bit-for-bit") {
    val evs = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => SessionEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), math.round(r.getDouble(4) * 100)))
      .sortBy(e => (e.us, e.event_id)).toSeq
    val input = MemoryStream[SessionEvent](spark)
    val q = StreamingAttribution.attributions(input.toDS())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      evs.grouped(math.max(evs.size / 3, 1)).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val recs = spark.table("attr_out")
        .as[StreamingAttribution.Attribution].collect().toSeq

      // q160 twin: daily last-touch report from the streamed records
      val got160 = recs.groupBy(_.p_us / 86400000000L).toSeq.map { case (day, rs) =>
        val att = rs.filter(_.n_touches > 0)
        (day, rs.size.toLong, att.size.toLong, att.size.toDouble / rs.size,
          att.map(r => BigDecimal(r.cents) / 100).sum.toDouble,
          rs.filter(_.n_touches == 0).map(r => BigDecimal(r.cents) / 100).sum.toDouble)
      }.sortBy(_._1)
      val want160 = graft.queries.Analytics2.q160.run(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toSeq
      assert(got160 == want160)

      // q162 twin: linear credits from the carried touch lists
      val credits = recs.filter(_.n_touches > 0).flatMap { r =>
        val k = r.n_touches
        val vMc = r.cents * 10L
        val base = vMc / k
        val rem = vMc - k * base
        val closest = r.touch_us.zip(r.touch_ids).max // (us, id) lexicographic
        r.touch_us.zip(r.touch_ids).map { case (us, id) =>
          (us / 86400000000L, base + (if ((us, id) == closest) rem else 0L))
        }
      }
      val got162 = credits.groupBy(_._1).toSeq
        .map { case (day, cs) => (day, cs.size.toLong, cs.map(_._2).sum) }
        .sortBy(_._1)
      val want162 = graft.queries.Analytics2.q162.run(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got162 == want162)
    } finally q.stop()
  }

  test("a late cross-batch event never deletes newer clicks from state") {
    // Batch 1: two fresh clicks. Batch 2: one LATE click (older than both),
    // then a purchase. With age-only pruning against the high-water mark,
    // the purchase must still see all three clicks; destructive pruning by
    // the late event's own timestamp would have wiped the two fresh ones.
    val t0 = 1000000000000L
    val b1 = Seq(
      SessionEvent(1L, 10L, t0 + 5000000L, "click", 0L),
      SessionEvent(1L, 11L, t0 + 6000000L, "click", 0L))
    val b2 = Seq(
      SessionEvent(1L, 9L, t0 + 1000000L, "click", 0L), // late, but in lookback
      SessionEvent(1L, 12L, t0 + 7000000L, "purchase", 500L))
    val input = MemoryStream[SessionEvent](spark)
    val q = StreamingAttribution.attributions(input.toDS())
      .writeStream.format("memory").queryName("attr_late")
      .outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val recs = spark.table("attr_late")
        .as[StreamingAttribution.Attribution].collect()
      assert(recs.length == 1)
      assert(recs.head.n_touches == 3L)
      assert(recs.head.touch_ids.sorted == Seq(9L, 10L, 11L))
      assert(recs.head.last_click_us == t0 + 6000000L)
    } finally q.stop()
  }
}
