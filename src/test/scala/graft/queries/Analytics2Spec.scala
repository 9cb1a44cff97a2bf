package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Twins for the exact-statistics batch: histogram quantiles checked
  * against a driver-side sort-and-select with the same rank rule, and
  * the OLS sums replayed in BigInt so the one-division determinism claim
  * is tested, not assumed. */
class Analytics2Spec extends SparkSpecBase {

  test("q151 histogram quantiles equal sort-and-select at the same ranks") {
    val prices = graft.Tables(spark, sfDir).lineitem
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = prices.groupBy(_._1).toSeq.map { case (flag, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length.toLong
      def pick(p: Int): Double = {
        // smallest value whose cumulative count reaches ceil(p*n/100):
        // 1-based rank r is the first with r*100 >= p*n
        val rank = ((p * n + 99) / 100).toInt // ceil
        sorted(rank - 1) / 100.0
      }
      (flag, n, pick(50), pick(90), pick(99))
    }.sortBy(_._1)
    val got = Analytics2.q151.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
  }

  test("q152 OLS slope and intercept replay from BigInt sums") {
    val anchor = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    val evs = graft.Tables(spark, sfDir).events
      .select(col("event_type"), unix_micros(col("ts")), col("value"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1) - anchor) / 3600000000L,
        math.round(r.getDouble(2) * 100)))
    val expected = evs.groupBy(_._1).toSeq.map { case (et, rows) =>
      val n = BigInt(rows.length)
      val sx = rows.map(r => BigInt(r._2)).sum
      val sy = rows.map(r => BigInt(r._3)).sum
      val sxy = rows.map(r => BigInt(r._2) * BigInt(r._3)).sum
      val sxx = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val den = n * sxx - sx * sx
      val num = n * sxy - sx * sy
      val slope = if (den == 0) 0.0 else num.toDouble / den.toDouble
      val icept = if (den == 0) 0.0
        else (sy.toDouble - slope * sx.toDouble) / n.toDouble
      (et, rows.length.toLong, slope, icept)
    }.sortBy(_._1)
    val got = Analytics2.q152.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
  }

  test("q154 burst verdicts replay from a driver-side trailing window") {
    val anchor = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    val hourly = graft.Tables(spark, sfDir).events
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1) - anchor) / 3600000000L))
      .groupBy(identity).map { case ((et, h), v) => (et, h, v.size.toLong) }.toSeq
    val expected = hourly.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.map { case (_, h, cnt) =>
        val trailing = sorted.filter(r => r._2 >= h - 24 && r._2 <= h - 1)
        val tSum = trailing.map(_._3).sum
        val tN = trailing.length.toLong
        (et, h, cnt, tSum, tN, tN >= 12 && cnt * tN >= 2 * tSum)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Analytics2.q154.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected)
  }

  test("q155 transitions conserve the event log") {
    val rows = Analytics2.q155.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ev = graft.Tables(spark, sfDir).events
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // each user contributes exactly (events − 1) transitions
    assert(rows.map(_._3).sum == nEvents - nUsers)
    // the from-type totals are consistent with the pair counts
    rows.groupBy(_._1).foreach { case (ft, rs) =>
      assert(rs.map(_._3).sum == rs.head._4, s"$ft n_from mismatch")
    }
  }

  test("q156 erasure audit balances and matches the hash cohort") {
    val rows = Analytics2.q156.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._2).sum == graft.Tables(spark, sfDir).events.count())
    rows.foreach { case (et, total, purged, kept, _) =>
      assert(purged + kept == total, s"$et quadrants do not balance")
    }
    // the purge flag is the deterministic hash test, recomputed independently
    val purgedTotal = graft.Tables(spark, sfDir).events
      .where(pmod(graft.QueryDsl.crossHash60(col("user_id")), lit(20L)) === 0)
      .count()
    assert(rows.map(_._3).sum == purgedTotal)
  }

  test("q157 profile equals driver-side distinct counts") {
    val o = graft.Tables(spark, sfDir).orders.collect()
    val byCol = Map(
      "o_orderkey" -> o.map(_.get(0)), "o_custkey" -> o.map(_.get(1)),
      "o_orderstatus" -> o.map(_.get(2)), "o_totalprice" -> o.map(_.get(3)),
      "o_orderdate" -> o.map(_.get(4)), "o_orderpriority" -> o.map(_.get(5)))
    val got = graft.queries.Relational4.q157.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (c, nRows, nNonnull, nDistinct) =>
      val vs = byCol(c)
      assert(nRows == o.length.toLong)
      assert(nNonnull == vs.count(_ != null).toLong)
      assert(nDistinct == vs.filter(_ != null).distinct.length.toLong, s"$c distinct")
    }
    assert(got.length == byCol.size)
  }
}
