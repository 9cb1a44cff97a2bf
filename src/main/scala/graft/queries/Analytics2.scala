package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl.dec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Second analytics batch: EXACT order statistics at scale (fixed-
  * precision histogram quantiles — the answer to "approx_percentile is
  * not auditable") and closed-form trend estimation (per-group OLS from
  * monoid sums). Both are one-scan, partial-aggregated shapes whose
  * outputs replay bit-for-bit in DuckDB.
  */
object Analytics2 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  // -- q151: exact quantiles via fixed-precision histogram --------------
  // p50/p90/p99 of l_extendedprice per return flag, EXACT — not the
  // approx_percentile sketch (q50 covers that): money is 2-decimal, so
  // the full value distribution collapses to a cents-keyed histogram
  // whose cardinality is the PRICE DOMAIN (bounded, ~10⁶ keys),
  // independent of row count. One scan builds the histogram with
  // map-side partial counts; cumulative counts run in a flag-
  // partitioned window over the domain-sized relation; the quantile at
  // p is the smallest value whose cumulative count reaches ⌈p·N/100⌉
  // (integer compare cum·100 ≥ p·N — no float rank arithmetic). This is
  // the scale-honest exact-quantile recipe for any fixed-precision
  // measure: a global sort touches every ROW, the histogram touches
  // every distinct VALUE. Outputs: exact integer N and three quantiles
  // whose only float op is the final ÷100.
  val q151 = q("q151_exact_quantiles",
    """WITH h AS (SELECT l_returnflag AS flag,
      |             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |             CAST(COUNT(*) AS BIGINT) AS cnt
      |           FROM lineitem GROUP BY 1, 2),
      |c AS (SELECT flag, cents, cnt,
      |        SUM(cnt) OVER (PARTITION BY flag ORDER BY cents
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |        SUM(cnt) OVER (PARTITION BY flag) AS n
      |      FROM h)
      |SELECT flag, CAST(MAX(n) AS BIGINT) AS n_rows,
      |  CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN cents END) AS DOUBLE) / 100.0 AS p50,
      |  CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN cents END) AS DOUBLE) / 100.0 AS p90,
      |  CAST(MIN(CASE WHEN cum * 100 >= 99 * n THEN cents END) AS DOUBLE) / 100.0 AS p99
      |FROM c GROUP BY flag ORDER BY flag""".stripMargin) { (s, dir) =>
    val hist = Tables(s, dir).lineitem
      .select(col("l_returnflag").as("flag"),
        (dec(col("l_extendedprice")) * 100).cast(LongType).as("cents"))
      .groupBy("flag", "cents").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("flag").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("flag")
    val c = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    def pct(p: Int) =
      (min(when(col("cum") * 100 >= lit(p) * col("n"), col("cents")))
        .cast(DoubleType) / lit(100.0))
    c.groupBy("flag")
      .agg(max(col("n")).as("n_rows"),
        pct(50).as("p50"), pct(90).as("p90"), pct(99).as("p99"))
      .orderBy("flag")
  }

  // -- q152: per-type value trend (closed-form OLS) ---------------------
  // Is the money-per-event drifting? Least-squares slope and intercept
  // of value (cents) over time (hours since a fixed epoch anchor) per
  // event type — the monitoring widget behind every "revenue trend"
  // alert, and the textbook reduction of regression to monoid sums:
  // slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²). One scan, five partial-
  // aggregated sums per group, output group-sized. Sums accumulate as
  // DECIMAL(38,0) — exact at any corpus size (Long sums would wrap
  // past ~100× sf0.1; DuckDB's SUM widens to int128 the same way) —
  // and the slope is ONE division of two exact integers cast to
  // double, so the doubles match bit-for-bit cross-engine. The
  // intercept chains two more IEEE ops on the same exact inputs —
  // identical expression tree both sides.
  val q152 = q("q152_value_trend",
    """WITH e AS (SELECT event_type,
      |             (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 3600000000 AS x,
      |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |           FROM events),
      |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |        CAST(SUM(x) AS DECIMAL(38,0)) AS sx, CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
      |        CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
      |        CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx
      |      FROM e GROUP BY 1)
      |SELECT event_type, n,
      |  CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
      |       ELSE CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
      |  END AS slope_cents_per_hour,
      |  CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
      |       ELSE (CAST(sy AS DOUBLE)
      |             - (CAST(n * sxy - sx * sy AS DOUBLE)
      |                / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
      |            / CAST(n AS DOUBLE)
      |  END AS intercept_cents
      |FROM a ORDER BY event_type""".stripMargin) { (s, dir) =>
    val d38 = DecimalType(38, 0)
    val e = Tables(s, dir).events
      .select(col("event_type"),
        expr("(unix_micros(ts) - unix_micros(timestamp'2024-01-01 00:00:00')) div 3600000000")
          .as("x"),
        (dec(col("value")) * 100).cast(LongType).as("y"))
    val a = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"), sum(col("y").cast(d38)).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"))
    val nD = col("n").cast(d38)
    val den = nD * col("sxx") - col("sx") * col("sx")
    val num = nD * col("sxy") - col("sx") * col("sy")
    val slope = num.cast(DoubleType) / den.cast(DoubleType)
    a.select(col("event_type"), col("n"),
        when(den === 0, lit(0.0)).otherwise(slope).as("slope_cents_per_hour"),
        when(den === 0, lit(0.0))
          .otherwise((col("sy").cast(DoubleType) - slope * col("sx").cast(DoubleType))
            / col("n").cast(DoubleType)).as("intercept_cents"))
      .orderBy("event_type")
  }

  // -- q154: traffic burst detection (trailing-window baseline) ---------
  // Per event type and hour: is this hour's volume ≥ 2× its trailing
  // 24-hour mean? The ops-monitoring primitive behind rate alerts,
  // spam/abuse triage, and incident timelines — expressed without a
  // single float: the comparison cnt·n_trailing ≥ 2·trailing_sum is an
  // integer cross-multiply (the q118/q131 rational trick), and the
  // trailing window is a RANGE frame over the hour value, so sparse
  // hours are handled by construction (no dense time spine join). A
  // 12-hour warm-up guard keeps the first hours from alerting on a
  // near-empty baseline.
  //
  // Scale: events collapse to (type, hour) — calendar-sized — in one
  // partial-aggregated pass; the window sorts within the tiny per-type
  // partition. Output is every (type, hour) with its verdict, so the
  // alert table doubles as the rate dashboard.
  val q154 = q("q154_burst_detection",
    """WITH h AS (SELECT event_type,
      |             (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 3600000000 AS hour,
      |             CAST(COUNT(*) AS BIGINT) AS cnt
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, hour, cnt,
      |        CAST(COALESCE(SUM(cnt) OVER tw, 0) AS BIGINT) AS trailing_sum,
      |        CAST(COALESCE(COUNT(cnt) OVER tw, 0) AS BIGINT) AS n_trailing
      |      FROM h
      |      WINDOW tw AS (PARTITION BY event_type ORDER BY hour
      |        RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, hour, cnt, trailing_sum, n_trailing,
      |  (n_trailing >= 12 AND cnt * n_trailing >= 2 * trailing_sum) AS is_burst
      |FROM w ORDER BY event_type, hour""".stripMargin) { (s, dir) =>
    val hourly = Tables(s, dir).events
      .select(col("event_type"),
        expr("(unix_micros(ts) - unix_micros(timestamp'2024-01-01 00:00:00')) div 3600000000")
          .as("hour"))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("cnt"))
    val tw = Window.partitionBy("event_type").orderBy("hour")
      .rangeBetween(-24, -1)
    hourly
      .withColumn("trailing_sum", coalesce(sum(col("cnt")).over(tw), lit(0L)))
      .withColumn("n_trailing", coalesce(count(col("cnt")).over(tw), lit(0L)))
      .withColumn("is_burst",
        col("n_trailing") >= 12 && col("cnt") * col("n_trailing") >= lit(2) * col("trailing_sum"))
      .orderBy("event_type", "hour")
  }

  // -- q155: event-type transition matrix (first-order Markov) ----------
  // For every consecutive event pair within a user's timeline: how often
  // does type A lead to type B? The session-flow fingerprint product
  // analytics reads (drop-off edges, loops), and the transition prior a
  // next-event model starts from. One lag() over the (ts, event_id)-
  // ordered user partition — the q137/q144 exchange — then a pair-keyed
  // count and a from-type total; share = one exact-integer division.
  // Output is |types|² ≤ 25 rows.
  val q155 = q("q155_event_transitions",
    """WITH x AS (
      |  SELECT event_type AS to_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      |  FROM events),
      |t AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM x WHERE from_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
      |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS share
      |FROM t ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables(s, dir).events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(wOrd))
      .where(col("from_type").isNotNull)
    val t = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    // from-type totals as a window over the |types|²-row aggregate — a
    // groupBy+self-join would plan the corpus-sized lag subtree twice
    val wFrom = Window.partitionBy("from_type")
    t.withColumn("n_from", sum(col("n")).over(wFrom))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast(DoubleType) / col("n_from").cast(DoubleType)).as("share"))
      .orderBy("from_type", "to_type")
  }

  // -- q156: right-to-be-forgotten sweep (erasure audit) ----------------
  // The GDPR/CCPA deletion job's AUDIT face: given a deletion cohort (a
  // deterministic hash slice standing in for the request table), report
  // per event type how many rows the sweep removes and keeps, and how
  // many distinct users are erased — the numbers a data-protection
  // officer signs off on before the anti-join rewrite runs. The
  // deletion set builds from the event log itself (no side input), the
  // classification is a map-only hash test (no join at all — at 100 TB
  // a real request table broadcasts into the same shape), and the
  // distinct-user count is a two-level aggregate, never an Expand.
  val q156 = q("q156_erasure_audit",
    s"""WITH e AS (SELECT event_type, user_id,
      |             (${graft.QueryDsl.crossHash60Sql("user_id")} % 20 = 0) AS purge
      |           FROM events),
      |per AS (SELECT event_type, purge, user_id, CAST(COUNT(*) AS BIGINT) AS n
      |        FROM e GROUP BY 1, 2, 3)
      |SELECT event_type,
      |  CAST(SUM(n) AS BIGINT) AS n_total,
      |  CAST(SUM(CASE WHEN purge THEN n ELSE 0 END) AS BIGINT) AS n_purged,
      |  CAST(SUM(CASE WHEN NOT purge THEN n ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN purge THEN 1 ELSE 0 END) AS BIGINT) AS purged_users
      |FROM per GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    import graft.QueryDsl.crossHash60
    val per = Tables(s, dir).events
      .select(col("event_type"), col("user_id"),
        (pmod(crossHash60(col("user_id")), lit(20L)) === 0).as("purge"))
      .groupBy("event_type", "purge", "user_id").agg(count(lit(1)).as("n"))
    per.groupBy("event_type")
      .agg(sum(col("n")).as("n_total"),
        sum(when(col("purge"), col("n")).otherwise(0L)).as("n_purged"),
        sum(when(!col("purge"), col("n")).otherwise(0L)).as("n_kept"),
        sum(when(col("purge"), 1L).otherwise(0L)).as("purged_users"))
      .orderBy("event_type")
  }

  val all: Seq[GraftQuery] = Seq(q151, q152, q154, q155, q156)
}
