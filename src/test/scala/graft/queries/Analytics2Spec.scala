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

  test("q160 attribution replays from a per-user event walk") {
    val evs = graft.Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        BigDecimal(r.getDouble(4)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val purchases = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var lastClick = Option.empty[Long]
      rows.sortBy(r => (r._3, r._2)).flatMap { r =>
        if (r._4 == "click") { lastClick = Some(r._3); None }
        else if (r._4 == "purchase")
          Some((r._3 / 86400000000L, r._5,
            lastClick.exists(c => r._3 - c <= 604800000000L)))
        else None
      }
    }
    val expected = purchases.groupBy(_._1).toSeq.map { case (day, ps) =>
      val att = ps.filter(_._3)
      (day, ps.size.toLong, att.size.toLong, att.size.toDouble / ps.size,
        att.map(_._2).sum.toDouble, ps.filterNot(_._3).map(_._2).sum.toDouble)
    }.sortBy(_._1)
    val got = Analytics2.q160.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected)
  }

  test("q162 credit conserves the attributed purchase value exactly") {
    // the floor-division + remainder-to-closest-touch rule must lose
    // nothing: total credited millicents == total value of purchases
    // with >= 1 in-window click (the same cohort q160 calls attributed)
    val evs = graft.Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        math.round(r.getDouble(4) * 100)))
    val attributedMc = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val clicks = rows.filter(_._4 == "click").map(_._3)
      rows.filter(_._4 == "purchase").collect {
        case p if clicks.exists(c => c <= p._3 && p._3 - c <= 604800000000L) =>
          p._5 * 10L // cents -> millicents
      }
    }.sum
    val rows = Analytics2.q162.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sum == attributedMc)
    assert(rows.forall(_._2 > 0))
  }

  test("q161 cohort latency quantiles replay from per-user firsts") {
    val evs = graft.Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val perUser = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sUs = rows.filter(_._3 == "signup").map(_._2).minOption
      sUs.map { s =>
        val pUs = rows.filter(r => r._3 == "purchase" && r._2 >= s).map(_._2).minOption
        (s / 604800000000L, pUs.map(p => (p - s) / 1000000L))
      }
    }
    val expected = perUser.groupBy(_._1).toSeq.map { case (week, us) =>
      val lats = us.flatMap(_._2).sorted
      def pick(p: Int): Option[Long] =
        if (lats.isEmpty) None else Some(lats(((p * lats.size.toLong + 99) / 100).toInt - 1))
      (week, us.size.toLong, lats.size.toLong, lats.size.toDouble / us.size,
        pick(50), pick(90))
    }.sortBy(_._1)
    val got = Analytics2.q161.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(got == expected)
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
