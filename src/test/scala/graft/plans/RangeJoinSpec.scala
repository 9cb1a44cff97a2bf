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

  test("null-bounded intervals are skipped, not fatal (SQL join semantics)") {
    val events = (0L until 20L).map(t => (t, s"e$t")).toDF("t", "tag")
    val intervals = Seq(
      (1L, Some(5L), Some(10L)),
      (2L, None, Some(10L)),      // null lo — can never match
      (3L, Some(5L), None)        // null hi — can never match
    ).toDF("iid", "lo", "hi")
    val got = RangeJoinApi.join(events, intervals, "t", "lo", "hi")
      .select("t", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = events.crossJoin(intervals)
      .where(col("lo") <= col("t") && col("t") < col("hi"))
      .select("t", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref)
    assert(got.forall(_._2 == 1L))
  }

  test("self-derived sides (shared exprIds) return correct right-side values") {
    // both sides come from the same DataFrame, so without dedup the
    // output projection would bind the right columns to the left ones
    val base = Seq((0L, 5L, 10L), (1L, 20L, 30L)).toDF("t", "lo", "hi")
    val events = base.select(col("t") + 7 as "t")            // 7, 8
    val intervals = base.select(col("lo"), col("hi"), col("t").as("iid"))
    val rows = RangeJoinApi.join(events, intervals, "t", "lo", "hi")
      .select("t", "iid", "lo", "hi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set((7L, 0L, 5L, 10L), (8L, 0L, 5L, 10L)))
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
