package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("matches the nested-loop reference on nested/overlapping intervals") {
    val events = (0L until 200L).map(t => (t, s"e$t")).toDF("t", "tag")
    val intervals = Seq(
      (1L, 0L, 50L),     // wide
      (2L, 10L, 20L),    // nested inside 1
      (3L, 15L, 60L),    // overlaps 1 and 2
      (4L, 100L, 100L),  // empty [100, 100)
      (5L, 150L, 151L),  // single point
      (6L, 40L, 45L)     // nested, later
    ).toDF("iid", "lo", "hi")

    val native = RangeJoinApi.join(events, intervals, "t", "lo", "hi")
      .select(col("t"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reference = events.crossJoin(intervals)
      .where(col("lo") <= col("t") && col("t") < col("hi"))
      .select(col("t"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == reference)
    assert(native.nonEmpty && !native.exists(_._2 == 4L)) // empty interval never matches
  }

  test("plans as RangeJoinExec with a broadcast interval side") {
    val events = (0L until 10L).map(t => (t, t * 2)).toDF("t", "x")
    val intervals = Seq((1L, 2L, 5L)).toDF("iid", "lo", "hi")
    val df = RangeJoinApi.join(events, intervals, "t", "lo", "hi")
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), plan)
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"), plan)
  }

  test("timestamp bounds work (micros-backed)") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:07:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:30:00"))).toDF("id", "ts")
    val win = Seq((9L,
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))).toDF("wid", "lo", "hi")
    val out = RangeJoinApi.join(events, win, "ts", "lo", "hi")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L))
  }
}
