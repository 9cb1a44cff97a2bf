package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl.sumDec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product-analytics suite — the KPI shapes the reference's users
  * (motorway powers a metrics/dashboard product) compute from event
  * streams: conversion funnels, cohort retention, and per-entity
  * engagement. All integer/timestamp arithmetic — bit-exact oracles.
  *
  * Scale notes: every query here is one shuffle on user_id (or day),
  * then per-partition windows/aggregates; funnel stage times chain
  * inside a single exchange (consecutive Window nodes share the
  * partitioning), and the retention matrix aggregates (cohort, offset)
  * pairs — output is calendar-sized, never event-sized.
  */
object Analytics {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  // -- q92: conversion funnel (view → click → purchase, ordered) --------
  // Stage timestamps chain: first view, first click AFTER that view,
  // first purchase AFTER that click — order-sensitive (a click before
  // the first view doesn't count). Three Window nodes over ONE
  // user-shuffle; the funnel counts aggregate the per-user booleans.
  val q92 = q("q92_funnel",
    """WITH u AS (
      |  SELECT user_id,
      |    min(ts) FILTER (event_type = 'view') AS t_view
      |  FROM events GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, u.t_view,
      |    min(e.ts) FILTER (e.event_type = 'click' AND e.ts > u.t_view) AS t_click
      |  FROM events e JOIN u USING (user_id) GROUP BY 1, 2),
      |p AS (
      |  SELECT e.user_id, c.t_view, c.t_click,
      |    min(e.ts) FILTER (e.event_type = 'purchase' AND e.ts > c.t_click) AS t_purchase
      |  FROM events e JOIN c USING (user_id) GROUP BY 1, 2, 3)
      |SELECT
      |  COUNT(*) AS n_users,
      |  CAST(COUNT(t_view) AS BIGINT) AS n_view,
      |  CAST(COUNT(t_click) AS BIGINT) AS n_view_click,
      |  CAST(COUNT(t_purchase) AS BIGINT) AS n_full_funnel,
      |  CAST(COUNT(t_click) AS DOUBLE) / COUNT(t_view) AS view_to_click,
      |  CAST(COUNT(t_purchase) AS DOUBLE) / COUNT(t_click) AS click_to_purchase
      |FROM p""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id")
    val staged = Tables(s, dir).events
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t_view", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"), col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"), col("ts"))).over(w))
      .groupBy("user_id")
      .agg(first("t_view").as("t_view"), first("t_click").as("t_click"),
        first("t_purchase").as("t_purchase"))
    staged.agg(
      count(lit(1)).as("n_users"),
      count(col("t_view")).as("n_view"),
      count(col("t_click")).as("n_view_click"),
      count(col("t_purchase")).as("n_full_funnel"),
      (count(col("t_click")).cast("double") / count(col("t_view"))).as("view_to_click"),
      (count(col("t_purchase")).cast("double") / count(col("t_click"))).as("click_to_purchase"))
  }

  // -- q93: cohort retention matrix -------------------------------------
  // Users cohorted by first-active day; activity counted per day offset
  // since the cohort day. Two aggregations (first-seen, then
  // cohort×offset distinct users) — the output is calendar², not
  // event-sized, at any scale.
  val q93 = q("q93_retention",
    """WITH f AS (SELECT user_id, CAST(min(CAST(ts AS DATE)) AS DATE) AS cohort_day
      |           FROM events GROUP BY 1),
      |a AS (SELECT DISTINCT e.user_id, f.cohort_day,
      |        date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      |      FROM events e JOIN f USING (user_id))
      |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
      |  CAST(day_offset AS INTEGER) AS day_offset,
      |  CAST(COUNT(*) AS BIGINT) AS active_users
      |FROM a WHERE day_offset <= 7 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir).events.select(col("user_id"), to_date(col("ts")).as("day"))
    val first = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    e.join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .where(col("day_offset") <= 7)
      .distinct()
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_day", "day_offset")
  }

  // -- q94: per-entity engagement summary (top users by value) ----------
  // The per-dashboard-widget aggregate: activity breadth (distinct
  // days, types) and monetary total per user, top-k. Single shuffle +
  // TakeOrderedAndProject.
  val q94 = q("q94_engagement",
    """SELECT user_id,
      |  COUNT(*) AS n_events,
      |  CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1
      |ORDER BY total_value DESC, user_id LIMIT 25""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("active_days"),
        countDistinct(col("event_type")).as("n_types"),
        sumDec(col("value")).as("total_value"))
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(25)
  }

  // -- q95: dynamic JSON payloads through VariantType -------------------
  // The schemaless escape hatch for envelope payloads (SURVEY.md §1.2):
  // parse once into Spark 4's VARIANT (binary-encoded, typed access
  // without re-parsing per field), extract with variant_get. The same
  // shape the reference's `recv_json` bodies imply — minus the
  // per-operator re-parse.
  val q95 = q("q95_variant_json",
    """SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
      |  CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_mod
      |FROM events WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 90
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val v = parse_json(col("props"))
    Tables(s, dir).events
      .select(col("event_id"),
        variant_get(v, "$.k", "bigint").as("k"))
      .where(col("k") >= 90)
      .withColumn("k_mod", col("k") % 10)
      .orderBy("event_id")
  }

  // -- q96: FULL OUTER join (both-sided null extension) -----------------
  // Building-segment customers ⟗ high-spend customers: rows surviving
  // from only one side carry nulls on the other — the join breadth
  // complement to inner/semi/anti/as-of elsewhere in the registry. Both
  // sides are aggregates, so the outer join runs on key-sized inputs.
  val q96 = q("q96_full_outer",
    """WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'),
      |o AS (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |      FROM orders GROUP BY 1
      |      HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > 300000)
      |SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
      |  c.c_name AS name, o.total AS total,
      |  (c.c_custkey IS NOT NULL) AS is_building,
      |  (o.o_custkey IS NOT NULL) AS has_big_orders
      |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
      |ORDER BY custkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val c = t.customer.where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val o = t.orders.groupBy(col("o_custkey"))
      .agg(sumDec(col("o_totalprice")).as("total"))
      .where(col("total") > 300000)
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name").as("name"), col("total"),
        col("c_custkey").isNotNull.as("is_building"),
        col("o_custkey").isNotNull.as("has_big_orders"))
      .orderBy("custkey")
  }

  // -- q137: session KPI rollup (30-min gap sessions, full record) ------
  // q18 LABELS sessions (the break/cumsum trick, count only); this is
  // the record a session dashboard actually reads — exact event-time
  // bounds in epoch micros, duration, event count, distinct types, and
  // the decimal-exact value total — and it is the batch reference the
  // STREAMING sessionizer (graft.streaming.StreamingSessionize, which
  // closes sessions by event-time timeout as the stream runs) must
  // reproduce bit-for-bit. lag + running
  // sum + the session aggregate all share ONE user_id exchange — the
  // lag/cumsum windows sort once, and the final groupBy(user_id,
  // sess_idx) is satisfied by the existing hash partitioning on
  // user_id (clustering on a superset key needs no new shuffle), so
  // the whole query is a single shuffle at any scale. All outputs are
  // exact integers except the decimal-summed value total; timestamps
  // surface as epoch micros (no format-string round-trip to diverge).
  // Ties on ts break by event_id in BOTH the window order and the lag,
  // so the labeling is deterministic cross-engine.
  val q137 = q("q137_sessionize",
    """WITH x AS (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
      |  FROM x)
      |SELECT user_id, CAST(sess_idx AS BIGINT) AS sess_idx,
      |  CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
      |  CAST(epoch_us(max(ts)) AS BIGINT) AS end_us,
      |  CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT) AS duration_sec,
      |  COUNT(*) AS n_events,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM s GROUP BY 1, 2 ORDER BY user_id, sess_idx""".stripMargin) { (s, dir) =>
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = Tables(s, dir).events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_idx", sum(col("new_sess")).over(wCum))
    marked.groupBy(col("user_id"), col("sess_idx"))
      .agg(
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"),
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sumDec(col("value")).as("total_value"))
      .withColumn("duration_sec",
        expr("(end_us - start_us) div 1000000"))
      .select(col("user_id"), col("sess_idx"), col("start_us"), col("end_us"),
        col("duration_sec"), col("n_events"), col("n_types"), col("total_value"))
      .orderBy("user_id", "sess_idx")
  }

  val all: Seq[GraftQuery] = Seq(q92, q93, q94, q95, q96, q137)
}
