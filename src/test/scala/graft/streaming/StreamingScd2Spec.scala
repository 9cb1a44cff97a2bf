package graft.streaming

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming SCD2 maintainer must emit, as the change stream runs,
  * EXACTLY the closed versions q144 rebuilds from the full log — same
  * numbering, bounds, and counts — with the open (current) versions
  * living in state rather than the sink. */
class StreamingScd2Spec extends SparkSpecBase {
  import spark.implicits._
  import StreamingSessionize.SessionEvent

  test("closed versions equal q144's non-current rows on the same log") {
    val evs = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => SessionEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), math.round(r.getDouble(4) * 100)))
      .sortBy(e => (e.us, e.event_id)).toSeq
    val input = MemoryStream[SessionEvent](spark)
    val out = StreamingScd2.versions(input.toDS())
    val q = out.writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    try {
      // three in-order micro-batches: versions must chain across batches
      evs.grouped(math.max(evs.size / 3, 1)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val got = spark.table("scd2_out")
        .select("user_id", "version", "tier", "valid_from_us", "valid_to_us",
          "n_events")
        .as[(Long, Long, String, Long, Long, Long)]
        .collect().toSeq.sortBy(t => (t._1, t._2))
      val batch = graft.queries.Relational4.q144.run(spark, sfDir).collect()
      val want = batch.filter(!_.isNullAt(4))
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .toSeq.sortBy(t => (t._1, t._2))
      assert(got.size == want.size,
        s"closed-version count: streaming ${got.size} vs batch ${want.size}")
      assert(got == want)
      // the open versions (never emitted) are exactly the batch's
      // is_current rows: one per user, numbered one past the last close
      val current = batch.filter(_.isNullAt(4))
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val lastClosed = got.groupBy(_._1).view.mapValues(_.map(_._2).max)
      lastClosed.foreach { case (uid, v) =>
        assert(current(uid) == v + 1, s"user $uid open-version numbering broken")
      }
      assert(current.size == batch.map(_.getLong(0)).distinct.length)
    } finally q.stop()
  }
}
