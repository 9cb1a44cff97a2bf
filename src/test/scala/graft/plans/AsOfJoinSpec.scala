package graft.plans

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before each left time") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:03"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2"),
      (2L, ts("2024-01-01 10:00:05"), "t3"),
      (3L, ts("2024-01-01 10:00:01"), "t4")).toDF("sym", "tts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:02"), 101.0),
      (1L, ts("2024-01-01 10:00:10"), 102.0), // equal ts: visible (<=)
      (2L, ts("2024-01-01 10:00:06"), 200.0)) // after the trade: invisible
      .toDF("qsym", "qts", "price")

    val got = AsOf.join(trades, quotes, "sym", "qsym", "tts", "qts")
      .select("trade", "price").collect().map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(got == Map(
      "t1" -> Some(101.0), // 10:00:02 quote
      "t2" -> Some(102.0), // equal-time quote visible
      "t3" -> None,        // only a later quote exists
      "t4" -> None))       // key has no quotes
  }

  test("physical plan is the custom exec with clustered+sorted children") {
    val t = Seq((1L, ts("2024-01-01 00:00:01"), "x")).toDF("k", "t", "v")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("rk", "rt", "p")
    val df = AsOf.join(t, r, "k", "rk", "t", "rt")
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(df.count() == 1)
  }

  test("matches the composed union+window formulation on real data") {
    val t = Tables(spark, sfDir)
    val orders = t.orders.groupBy("o_custkey", "o_orderdate")
      .agg(max("o_totalprice").as("o_totalprice"))
    val got = AsOf.join(
        t.events.select("event_id", "user_id", "ts"), orders,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("last_orderdate"),
        col("o_totalprice").as("last_totalprice"))
    val expected = graft.queries.Relational.q19.run(spark, sfDir)
      .select("event_id", "last_orderdate", "last_totalprice")
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
