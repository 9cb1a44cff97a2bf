package graft.streaming

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming burst detector must emit, after the watermark passes
  * every open hour, EXACTLY the (type, hour) verdict rows q154 computes
  * from the full log — counts, trailing baselines, and burst flags. */
class StreamingBurstSpec extends SparkSpecBase {
  import spark.implicits._
  import StreamingSessionize.SessionEvent

  test("hour verdicts equal the q154 batch rows on the same log") {
    val evs = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => SessionEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), math.round(r.getDouble(4) * 100)))
      .sortBy(e => (e.us, e.event_id)).toSeq
    val input = MemoryStream[SessionEvent](spark)
    val out = StreamingBurst.bursts(input.toDS(), delaySec = 1)
    val q = out.writeStream.format("memory").queryName("burst_out")
      .outputMode("append").start()
    try {
      evs.grouped(math.max(evs.size / 3, 1)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      // sentinel far past every hour: closes all open hours, then a
      // second batch gives the timeout a batch to fire in
      val far = evs.map(_.us).max + 48L * 3600L * 1000000L
      input.addData(Seq(SessionEvent(-1L, 0L, far, "zz_sentinel", 0L)))
      q.processAllAvailable()
      input.addData(Seq(SessionEvent(-1L, 1L, far + 1000000L, "zz_sentinel", 0L)))
      q.processAllAvailable()

      val got = spark.table("burst_out")
        .where(col("event_type") =!= "zz_sentinel")
        .as[(String, Long, Long, Long, Long, Boolean)]
        .collect().toSeq.sortBy(t => (t._1, t._2))
      val want = graft.queries.Analytics2.q154.run(spark, sfDir)
        .as[(String, Long, Long, Long, Long, Boolean)]
        .collect().toSeq.sortBy(t => (t._1, t._2))
      assert(got.size == want.size,
        s"verdict count: streaming ${got.size} vs batch ${want.size}")
      assert(got == want)
    } finally q.stop()
  }

  test("a planted burst raises an alert through the stats listener") {
    // 30 flat hours of 10 events, then one hour at 3x the baseline
    val base = (0 until 30).flatMap { h =>
      (0 until 10).map(i => SessionEvent(1L, h * 100L + i,
        1704067200000000L + h * 3600000000L + i * 1000000L, "api", 0L))
    }
    val burst = (0 until 30).map(i => SessionEvent(1L, 9000L + i,
      1704067200000000L + 30L * 3600000000L + i * 1000000L, "api", 0L))
    val listener = new PipelineStatsListener()
    val input = MemoryStream[SessionEvent](spark)
    val q = StreamingBurst.bursts(input.toDS(), delaySec = 1).writeStream
      .queryName("burst_alerts").outputMode("append")
      .foreachBatch(StreamingBurst.alertHook(listener, "burst_alerts"))
      .start()
    try {
      input.addData(base); q.processAllAvailable()
      input.addData(burst); q.processAllAvailable()
      // sentinels close the burst hour
      val far = 1704067200000000L + 80L * 3600000000L
      input.addData(Seq(SessionEvent(-1L, 0L, far, "api", 0L))); q.processAllAvailable()
      input.addData(Seq(SessionEvent(-1L, 1L, far + 1000000L, "api", 0L))); q.processAllAvailable()
      val failures = listener.snapshot.get("burst_alerts")
        .map(_.failures).getOrElse(Vector.empty)
      assert(failures.exists(_.messageId == "burst-api-30"),
        s"expected the hour-30 burst alert, got: ${failures.map(_.messageId)}")
    } finally q.stop()
  }

  test("a backfill batch force-closes its own old hours at fold time") {
    // one batch spanning 60 hours: verdicts for everything >24h behind
    // the batch's newest event must emit from that same fold, without
    // waiting for the watermark to catch up in a later batch — this is
    // what keeps state ≤ ~49 buckets mid-backfill
    val backfill = (0 until 60).map(h => SessionEvent(1L, h.toLong,
      1704067200000000L + h * 3600000000L, "bf", 0L))
    val perBatch = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    val input = MemoryStream[SessionEvent](spark)
    val q = StreamingBurst.bursts(input.toDS(), delaySec = 1).writeStream
      .queryName("burst_backfill").outputMode("append")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[StreamingBurst.HourVerdict],
                       id: Long) =>
        perBatch.put(id, ds.collect().map(_.hour).sorted.toSeq); ()
      }
      .start()
    try {
      input.addData(backfill); q.processAllAvailable()
      // BATCH 0 folds with the watermark still at epoch 0 — only the
      // fold-time forced close can emit here. maxH = 59 → hours < 35.
      val batch0 = perBatch.getOrDefault(0L, Nil)
      assert(batch0 == (0L until 35L),
        s"expected hours 0..34 emitted from the backfill fold itself, got $batch0")
    } finally q.stop()
  }

  // One corrupt far-future timestamp used to drive the forced close (and
  // the hour-by-hour verdict walk) to the corrupt hour — a multi-minute
  // near-hang and a poisoned frontier. The clamp bounds the close to the
  // watermark + backfill horizon, so the fold stays fast and every real
  // open hour is still judged exactly once.
  test("a corrupt far-future timestamp cannot hang the fold or lose real verdicts") {
    val base = (0 until 30).map(h => SessionEvent(1L, h.toLong,
      1704067200000000L + h * 3600000000L, "cx", 0L))
    val input = MemoryStream[SessionEvent](spark)
    val q = StreamingBurst.bursts(input.toDS(), delaySec = 1).writeStream
      .queryName("burst_corrupt").outputMode("append").format("memory").start()
    try {
      input.addData(base); q.processAllAvailable()
      // ~290 billion hours past the anchor; unclamped, the verdict walk
      // would iterate from hour 0 to corruptH-24
      val corrupt = SessionEvent(9L, 999L, Long.MaxValue - 3600000000L, "cx", 0L)
      val t0 = System.nanoTime()
      input.addData(Seq(corrupt)); q.processAllAvailable()
      val dtSec = (System.nanoTime() - t0) / 1e9
      assert(dtSec < 30.0, f"corrupt-timestamp fold took $dtSec%.1f s — the walk is unclamped")
      val got = spark.table("burst_corrupt")
        .as[(String, Long, Long, Long, Long, Boolean)]
        .collect().toSeq.filter(_._1 == "cx").map(_._2).sorted
      assert(got == (0L to 29L),
        s"real hours must each be judged exactly once despite the corruption, got $got")
    } finally q.stop()
  }
}
