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

  // -- q160: last-touch attribution (7-day lookback) --------------------
  // Marketing's bread-and-butter join, expressed as ONE user-keyed
  // window instead of a purchases⋈clicks range join: a running
  // "latest click so far" rides the (ts, event_id)-ordered user
  // partition, and a purchase is attributed iff that click is within
  // the 7-day lookback. The q41 as-of join generalizes this to two
  // relations; here both sides live in one event log, so the windowed
  // form does it in the q137/q144/q155 single exchange. Daily report:
  // purchases, attributed count, one-division share, and exact decimal
  // value split (attributed vs organic).
  val q160 = q("q160_attribution",
    """WITH x AS (
      |  SELECT event_type, value, epoch_us(ts) AS us,
      |    (epoch_us(ts)) // 86400000000 AS day,
      |    MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
      |  FROM events),
      |p AS (SELECT day, CAST(value AS DECIMAL(18,2)) AS v,
      |        (last_click_us IS NOT NULL
      |         AND us - last_click_us <= 604800000000) AS attributed
      |      FROM x WHERE event_type = 'purchase')
      |SELECT day,
      |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(SUM(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
      |  CAST(SUM(CASE WHEN attributed THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
      |    AS attributed_share,
      |  CAST(SUM(CASE WHEN attributed THEN v ELSE 0 END) AS DOUBLE) AS attributed_value,
      |  CAST(SUM(CASE WHEN NOT attributed THEN v ELSE 0 END) AS DOUBLE) AS organic_value
      |FROM p GROUP BY day ORDER BY day""".stripMargin) { (s, dir) =>
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = Tables(s, dir).events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", col("us"))).over(wOrd))
    val p = x.where(col("event_type") === "purchase")
      .select(col("day"), dec(col("value")).as("v"),
        (col("last_click_us").isNotNull &&
          col("us") - col("last_click_us") <= 604800000000L).as("attributed"))
    p.groupBy("day")
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
        sum(when(col("attributed"), col("v")).otherwise(lit(0).cast(DecimalType(18, 2))))
          .cast(DoubleType).as("attributed_value"),
        sum(when(!col("attributed"), col("v")).otherwise(lit(0).cast(DecimalType(18, 2))))
          .cast(DoubleType).as("organic_value"))
      .withColumn("attributed_share",
        col("n_attributed").cast(DoubleType) / col("n_purchases"))
      .select(col("day"), col("n_purchases"), col("n_attributed"),
        col("attributed_share"), col("attributed_value"), col("organic_value"))
      .orderBy("day")
  }

  // -- q161: signup-cohort conversion latency ---------------------------
  // Per signup week: how many users signed up, how many converted
  // (first purchase at/after their first signup), and the EXACT p50/p90
  // of the conversion delay — the activation report growth teams read
  // weekly. The latency distribution collapses to a (week, seconds)
  // histogram (user-cardinality bound), so the quantiles are the q151
  // cumulative-rank selection inside each week partition — no
  // row-grain sort, no approx sketch, bit-identical cross-engine.
  // Scale: one aggregate for first-signups, one pushed-filter purchase
  // scan joined against it, then cohort-sized aggregates end to end.
  val q161 = q("q161_conversion_latency",
    """WITH su AS (SELECT user_id,
      |             CAST(MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS BIGINT)
      |               AS s_us
      |           FROM events GROUP BY user_id),
      |s2 AS (SELECT user_id, s_us, s_us // 604800000000 AS week FROM su
      |       WHERE s_us IS NOT NULL),
      |pu AS (SELECT e.user_id, CAST(MIN(epoch_us(e.ts)) AS BIGINT) AS p_us
      |       FROM events e JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s2.s_us
      |       GROUP BY e.user_id),
      |conv AS (SELECT s2.week, s2.user_id,
      |           CASE WHEN pu.p_us IS NULL THEN NULL
      |                ELSE (pu.p_us - s2.s_us) // 1000000 END AS lat
      |         FROM s2 LEFT JOIN pu ON s2.user_id = pu.user_id),
      |tot AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS n_signups,
      |          CAST(SUM(CASE WHEN lat IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |            AS n_converted
      |        FROM conv GROUP BY week),
      |h AS (SELECT week, lat, CAST(COUNT(*) AS BIGINT) AS cnt FROM conv
      |      WHERE lat IS NOT NULL GROUP BY week, lat),
      |c AS (SELECT week, lat, cnt,
      |        SUM(cnt) OVER (PARTITION BY week ORDER BY lat
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |        SUM(cnt) OVER (PARTITION BY week) AS n
      |      FROM h),
      |q AS (SELECT week,
      |        CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN lat END) AS BIGINT) AS p50_latency_sec,
      |        CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN lat END) AS BIGINT) AS p90_latency_sec
      |      FROM c GROUP BY week)
      |SELECT tot.week, n_signups, n_converted,
      |  CAST(n_converted AS DOUBLE) / n_signups AS conversion_rate,
      |  q.p50_latency_sec, q.p90_latency_sec
      |FROM tot LEFT JOIN q ON tot.week = q.week ORDER BY tot.week""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir).events
    val s2 = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("s_us"))
      .where(col("s_us").isNotNull)
      .withColumn("week", expr("s_us div 604800000000"))
    val pu = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us0"))
      .join(s2.select("user_id", "s_us"), Seq("user_id"))
      .where(col("p_us0") >= col("s_us"))
      .groupBy("user_id").agg(min(col("p_us0")).as("p_us"))
    val conv = s2.join(pu, Seq("user_id"), "left")
      .select(col("week"),
        when(col("p_us").isNull, lit(null).cast(LongType))
          .otherwise(expr("(p_us - s_us) div 1000000")).as("lat"))
    val tot = conv.groupBy("week")
      .agg(count(lit(1)).as("n_signups"),
        sum(when(col("lat").isNotNull, 1L).otherwise(0L)).as("n_converted"))
    val wCum = Window.partitionBy("week").orderBy("lat")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("week")
    val c = conv.where(col("lat").isNotNull)
      .groupBy("week", "lat").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val qx = c.groupBy("week")
      .agg(min(when(col("cum") * 100 >= lit(50) * col("n"), col("lat"))).as("p50_latency_sec"),
        min(when(col("cum") * 100 >= lit(90) * col("n"), col("lat"))).as("p90_latency_sec"))
    tot.join(qx, Seq("week"), "left")
      .select(col("week"), col("n_signups"), col("n_converted"),
        (col("n_converted").cast(DoubleType) / col("n_signups").cast(DoubleType))
          .as("conversion_rate"),
        col("p50_latency_sec"), col("p90_latency_sec"))
      .orderBy("week")
  }

  // -- q162: linear multi-touch attribution (exact credit split) --------
  // The complement of q160's last-touch rule: every click inside the
  // 7-day lookback shares the purchase's value equally — the report is
  // "which CLICK-day earned today's revenue". Credit arithmetic is
  // exact integers: value in millicents, floor-divided by the touch
  // count, with the division remainder assigned to the click closest
  // to the purchase (a deterministic tie rule both engines replay) —
  // no per-touch float shares whose re-summation order could diverge.
  //
  // Scale: the click×purchase pair space is USER-keyed (equi-join on
  // user_id, range predicate inside the user's partition) — per-user
  // fan-out, never corpus×corpus; the touch count and remainder rank
  // ride one purchase-keyed window over the pair relation; the report
  // aggregates by click day. Purchases with no in-window click are
  // q160's organic slice and deliberately absent here.
  val q162 = q("q162_multitouch_attribution",
    """WITH c AS (SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_us
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us,
      |        CAST(CAST(value AS DECIMAL(18,2)) * 1000 AS BIGINT) AS v_mc
      |      FROM events WHERE event_type = 'purchase'),
      |pr AS (SELECT p.p_id, p.v_mc, c.c_id, c.c_us,
      |         CAST(COUNT(*) OVER (PARTITION BY p.p_id) AS BIGINT) AS k,
      |         row_number() OVER (PARTITION BY p.p_id
      |           ORDER BY c.c_us DESC, c.c_id DESC) AS rk
      |       FROM p JOIN c ON p.user_id = c.user_id
      |       WHERE c.c_us <= p.p_us AND p.p_us - c.c_us <= 604800000000),
      |cr AS (SELECT c_us // 86400000000 AS day,
      |         v_mc // k + CASE WHEN rk = 1 THEN v_mc - k * (v_mc // k) ELSE 0 END
      |           AS credit
      |       FROM pr)
      |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_credits,
      |  CAST(SUM(credit) AS BIGINT) AS credit_millicents
      |FROM cr GROUP BY day ORDER BY day""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir).events
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"),
        unix_micros(col("ts")).as("c_us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_us"),
        (dec(col("value")) * 1000).cast(LongType).as("v_mc"))
    val wK = Window.partitionBy("p_id")
    val wRk = Window.partitionBy("p_id").orderBy(col("c_us").desc, col("c_id").desc)
    val pairs = purchases.join(clicks, Seq("user_id"))
      .where(col("c_us") <= col("p_us") &&
        col("p_us") - col("c_us") <= 604800000000L)
      .withColumn("k", count(lit(1)).over(wK))
      .withColumn("rk", row_number().over(wRk))
    val credits = pairs.select(
      expr("c_us div 86400000000").as("day"),
      (expr("v_mc div k") +
        when(col("rk") === 1, col("v_mc") - col("k") * expr("v_mc div k"))
          .otherwise(0L)).as("credit"))
    credits.groupBy("day")
      .agg(count(lit(1)).as("n_credits"), sum(col("credit")).as("credit_millicents"))
      .orderBy("day")
  }

  val all: Seq[GraftQuery] = Seq(q151, q152, q154, q155, q156, q160, q161, q162)
}
