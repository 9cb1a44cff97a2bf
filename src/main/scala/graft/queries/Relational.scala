package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The relational surface (SURVEY.md §2.4): scans, filter/project
  * pushdown, joins (broadcast/semi/anti), aggregation, windows, sorts,
  * set ops, scalar/date/json functions, rollup, sessionization, as-of.
  *
  * Reference context: plecto/motorway has none of these as engine
  * primitives (SURVEY.md §2.4 — users hand-roll them inside `process()`
  * bodies, e.g. dict counters in `examples/intersections.py:19-31`);
  * here each is a declarative Catalyst plan so pushdown, partial
  * aggregation, AQE and broadcast selection come for free.
  *
  * Scale notes (100 TB): every groupBy shuffles on its keys with
  * map-side partial aggregation; dimension tables (region/nation/
  * supplier/customer) are explicitly `broadcast()` so the big fact scan
  * never shuffles for them; top-k uses TakeOrderedAndProject (no global
  * sort); window queries shuffle once on the partition key.
  */
object Relational {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  // -- q01: TPC-H Q1 style pricing summary (hash agg, partial+final) ----
  val q01 = q("q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .where(col("l_shipdate") <= lit("2000-01-01 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        sumDec(col("l_extendedprice")).as("sum_base_price"),
        sum(dec("l_extendedprice") * oneMinus(col("l_discount"))).cast("double").as("sum_disc_price"),
        avgDec(col("l_quantity")).as("avg_qty"),
        avgDec(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // -- q02: filter + projection pushdown to the parquet scan ------------
  val q02 = q("q02_filter_pushdown",
    """SELECT l_orderkey, l_linenumber, l_extendedprice AS price, l_discount AS discount
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .where(col("l_shipdate") >= lit("1998-01-01 00:00:00") &&
             col("l_shipdate") <  lit("1999-01-01 00:00:00") &&
             col("l_discount") >= 0.05 && col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("price"), col("l_discount").as("discount"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // -- q03: TPC-H Q3 style 3-way join + agg + top-k ---------------------
  val q03 = q("q03_top_revenue",
    s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
       | $SUM_DISC_PRICE AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, o_orderkey
       |LIMIT 10""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val c = t.customer.where(col("c_mktsegment") === "BUILDING")
    val o = t.orders.where(col("o_orderdate") < lit("1998-01-01 00:00:00"))
    // Aggregate lineitem revenue per orderkey BEFORE the join: the fact
    // table shrinks ~4× ahead of the shuffle, partial aggregation runs
    // map-side, and the post-agg partitioning (l_orderkey) lines up with
    // the join key so no extra exchange is inserted. o_orderkey is
    // unique, so the post-join result needs no second aggregation.
    val l = t.lineitem.where(col("l_shipdate") > lit("1997-01-01 00:00:00"))
      .groupBy(col("l_orderkey"))
      .agg(sum(dec("l_extendedprice") * oneMinus(col("l_discount"))).as("rev_dec"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("c_custkey") === col("o_custkey"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"),
        col("rev_dec").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  // -- q04: TPC-H Q5 style star join; all dims broadcast ----------------
  val q04 = q("q04_region_revenue",
    s"""SELECT r_name, n_name, $SUM_DISC_PRICE AS revenue
       |FROM region
       |JOIN nation   ON n_regionkey = r_regionkey
       |JOIN supplier ON s_nationkey = n_nationkey
       |JOIN lineitem ON l_suppkey   = s_suppkey
       |JOIN orders   ON o_orderkey  = l_orderkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val dims = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
    t.lineitem
      .join(t.orders.where(col("o_orderdate") >= lit("1996-01-01 00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(dec("l_extendedprice") * oneMinus(col("l_discount"))).cast("double").as("revenue"))
      .orderBy("r_name", "n_name")
  }

  // -- q05: left-semi join (EXISTS) -------------------------------------
  val q05 = q("q05_semi_join",
    """SELECT o_orderkey, o_totalprice
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.orders
      .join(t.lineitem.where(col("l_quantity") > 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // -- q06: left-anti join (NOT EXISTS) ---------------------------------
  val q06 = q("q06_anti_join",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer
      .join(t.orders.where(col("o_orderdate") >= lit("2001-01-01 00:00:00")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // -- q07: ranking window function (top-3 orders per customer) ---------
  val q07 = q("q07_window_topn",
    """WITH r AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
      |FROM r WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir).orders
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
      .orderBy("o_custkey", "rk")
  }

  // -- q08: running-sum window frame ------------------------------------
  val q08 = q("q08_running_sum",
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir).events
      .withColumn("running_value", sum(dec("value")).over(w).cast("double"))
      .select("user_id", "event_id", "running_value")
      .orderBy("user_id", "event_id")
  }

  // -- q09: top-k (TakeOrderedAndProject, no global sort) ---------------
  val q09 = q("q09_topk",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 20""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
  }

  // -- q10: set operations (UNION / INTERSECT / EXCEPT) -----------------
  val q10 = q("q10_set_ops",
    """WITH u AS (SELECT user_id, event_type, COUNT(*) AS n
      |           FROM events GROUP BY 1, 2)
      |SELECT user_id FROM (
      |  SELECT user_id FROM (
      |    SELECT user_id FROM u WHERE event_type = 'purchase' AND n >= 15
      |    UNION
      |    SELECT user_id FROM u WHERE event_type = 'signup' AND n >= 15)
      |  INTERSECT
      |  SELECT user_id FROM u WHERE event_type = 'view' AND n >= 12
      |  EXCEPT
      |  SELECT user_id FROM u WHERE event_type = 'error' AND n >= 16)
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val u = Tables(s, dir).events
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
    def users(tpe: String, minN: Int) =
      u.where(col("event_type") === tpe && col("n") >= minN).select("user_id")
    users("purchase", 15).union(users("signup", 15)).distinct()
      .intersect(users("view", 12))
      .except(users("error", 16))
      .orderBy("user_id")
  }

  // -- q11: distinct aggregation ----------------------------------------
  val q11 = q("q11_distinct_agg",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS distinct_parts,
      |  COUNT(DISTINCT l_suppkey) AS distinct_supps,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  // -- q12: ROLLUP (grouping sets) --------------------------------------
  val q12 = q("q12_rollup",
    """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .rollup("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), sumDec(col("o_totalprice")).as("total"))
      .orderBy(asc_nulls_first("o_orderpriority"), asc_nulls_first("o_orderstatus"))
  }

  // -- q13: scalar string/math functions --------------------------------
  val q13 = q("q13_scalar_funcs",
    """SELECT p_partkey,
      |  upper(p_name) AS name_up,
      |  substring(p_type, 1, 5) AS type_pfx,
      |  CAST(length(p_name) AS INTEGER) AS name_len,
      |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(1.10 AS DECIMAL(18,2)) AS DOUBLE) AS price_infl,
      |  abs(p_size - 25) AS size_dev,
      |  concat(p_brand, ':', p_type) AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).part.select(
      col("p_partkey"),
      upper(col("p_name")).as("name_up"),
      substring(col("p_type"), 1, 5).as("type_pfx"),
      length(col("p_name")).as("name_len"),
      (dec("p_retailprice") * lit(1.10).cast("decimal(18,2)")).cast("double").as("price_infl"),
      abs(col("p_size") - 25).as("size_dev"),
      concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")
  }

  // -- q14: date/time functions -----------------------------------------
  val q14 = q("q14_date_funcs",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(month(o_orderdate) AS INTEGER) AS mo,
      |  CAST(day(o_orderdate) AS INTEGER) AS dom,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders.select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dom"),
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
      .orderBy("o_orderkey")
  }

  // -- q15: JSON extraction (semi-structured payloads, SURVEY §1.2) -----
  val q15 = q("q15_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k")
  }

  // -- q16: processing-time tumbling window (controller histogram ≙) ----
  // Motorway's 60-minute stats histogram (`controller.py:55-59`) is a
  // per-minute bucket agg; here as an hourly tumbling-window aggregate.
  val q16 = q("q16_hourly_agg",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumDec(col("value")).as("sum_value"))
      .orderBy("hour", "event_type")
  }

  // -- q17: CASE WHEN + HAVING ------------------------------------------
  val q17 = q("q17_case_having",
    """SELECT CASE WHEN l_quantity < 10 THEN 'low'
      |            WHEN l_quantity < 30 THEN 'mid'
      |            ELSE 'high' END AS bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM lineitem GROUP BY 1 HAVING COUNT(*) > 100 ORDER BY bucket""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy(
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("bucket"))
      .agg(count(lit(1)).as("n"), sumDec(col("l_extendedprice")).as("total"))
      .where(col("n") > 100)
      .orderBy("bucket")
  }

  // -- q18: sessionization (30-min gap) via lag + running sum -----------
  // The streaming twin is `session_window`; this is the batch formulation
  // that scales: one shuffle on user_id, two window passes, no state.
  val q18 = q("q18_sessionize",
    """WITH x AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT user_id, event_id,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      |  FROM x)
      |SELECT user_id, CAST(sess AS INTEGER) AS session_id, COUNT(*) AS n_events
      |FROM y GROUP BY user_id, sess ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir).events
      .withColumn("brk",
        when(unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)) > 1800000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("brk")).over(wf).cast("int"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")
  }

  // -- q19: as-of join (latest order at-or-before each event) -----------
  // Composed from built-ins (preference (a) in the build rules): union
  // the two sides tagged, sort within user partition by time, carry the
  // last order forward. One shuffle + one window sort — scales linearly,
  // unlike a per-row subquery.
  val q19 = q("q19_asof_join",
    """SELECT e.event_id, e.user_id,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS last_orderdate,
      |  o.o_totalprice AS last_totalprice
      |FROM events e
      |ASOF LEFT JOIN (SELECT o_custkey, o_orderdate, max(o_totalprice) AS o_totalprice
      |                FROM orders GROUP BY 1, 2) o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    // Orders are first deduped to one row per (key, ts) — ASOF with
    // duplicate timestamps is otherwise an arbitrary pick in any engine.
    val o = t.orders
      .groupBy("o_custkey", "o_orderdate")
      .agg(max(col("o_totalprice")).as("o_totalprice"))
      .select(
        col("o_custkey").as("user_id"), col("o_orderdate").as("ts"),
        lit(null).cast("long").as("event_id"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("last_orderdate"),
        col("o_totalprice").as("last_totalprice"),
        lit(0).as("is_event"))
    val e = t.events.select(
      col("user_id"), col("ts"), col("event_id"),
      lit(null).cast("string").as("last_orderdate"),
      lit(null).cast("double").as("last_totalprice"),
      lit(1).as("is_event"))
    // Orders sort before events at identical ts (is_event asc) so an
    // order exactly at the event time is visible to it (>= semantics).
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_event"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("last_orderdate", last(col("last_orderdate"), ignoreNulls = true).over(w))
      .withColumn("last_totalprice", last(col("last_totalprice"), ignoreNulls = true).over(w))
      .where(col("is_event") === 1)
      .select("event_id", "user_id", "last_orderdate", "last_totalprice")
      .orderBy("event_id")
  }

  // -- q35: CUBE (full grouping-set lattice) ----------------------------
  val q35 = q("q35_cube",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sumDec(col("l_quantity")).as("qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  // -- q38: scalar subquery (orders above the global average) -----------
  val q38 = q("q38_scalar_subquery",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |                                   / COUNT(*) FROM orders)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables(s, dir).orders
    val avgPrice = o.agg(avgDec(col("o_totalprice")).as("avg_price"))
    o.crossJoin(broadcast(avgPrice)) // scalar broadcast, no driver collect
      .where(col("o_totalprice") > lit(1.5) * col("avg_price"))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // -- q41: as-of join through the native custom operator ---------------
  // Same semantics and oracle as q19, but executed by the custom
  // LogicalPlan + Strategy + BinaryExecNode (graft.plans.AsOfJoin):
  // single-pass sort-merge per key partition instead of union + window.
  val q41 = q("q41_asof_native",
    """SELECT e.event_id, e.user_id,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS last_orderdate,
      |  o.o_totalprice AS last_totalprice
      |FROM events e
      |ASOF LEFT JOIN (SELECT o_custkey, o_orderdate, max(o_totalprice) AS o_totalprice
      |                FROM orders GROUP BY 1, 2) o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val orders = t.orders.groupBy("o_custkey", "o_orderdate")
      .agg(max(col("o_totalprice")).as("o_totalprice"))
    graft.plans.AsOf.join(
        t.events.select("event_id", "user_id", "ts"), orders,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("user_id"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("last_orderdate"),
        col("o_totalprice").as("last_totalprice"))
      .orderBy("event_id")
  }

  // -- q39: cross-table date arithmetic (ship delay by priority) --------
  val q39 = q("q39_ship_delay",
    """SELECT o_orderpriority,
      |  CAST(SUM(datediff('day', o_orderdate, l_shipdate)) AS BIGINT) AS total_delay_days,
      |  CAST(SUM(datediff('day', o_orderdate, l_shipdate)) AS DOUBLE) / COUNT(*) AS avg_delay_days,
      |  COUNT(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("delay"))
      .groupBy("o_orderpriority")
      .agg(
        sum(col("delay")).as("total_delay_days"),
        (sum(col("delay")).cast("double") / count(lit(1))).as("avg_delay_days"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  // -- q42: exact quantiles (interpolated percentile) -------------------
  // Spark `percentile` and DuckDB `quantile_cont` both compute the
  // linearly-interpolated exact quantile; interpolation arithmetic can
  // differ in the last ulp → round(6) on both sides.
  val q42 = q("q42_quantiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"),
        round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99"))
      .orderBy("l_returnflag")
  }

  // -- q43: PIVOT (long → wide on a categorical) ------------------------
  val q43 = q("q43_pivot",
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "purchase", "view", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")
  }

  // -- q44: stratified sampling (per-stratum fractions, deterministic) --
  // Bernoulli-per-stratum realized as a hash draw on the row key instead
  // of an engine-RNG (`sampleBy`): the same rows are selected on every
  // run, every engine, every cluster size — which is what makes a 100 TB
  // sample auditable — and the query becomes oracle-checkable. Map-only
  // before the stratum-count aggregate.
  val q44 = GraftQuery("q44_stratified_sample", (s, dir) => {
    import graft.QueryDsl.crossHash60
    val per10k = when(col("event_type") === "click", 5000)
      .when(col("event_type") === "purchase", 1000)
      .when(col("event_type") === "view", 2500)
      .when(col("event_type") === "signup", 10000)
      .otherwise(0)
    Tables(s, dir).events
      .where(pmod(crossHash60(col("event_id")), lit(10000)) < per10k)
      .groupBy("event_type").agg(count(lit(1)).as("sampled_n"))
      .orderBy("event_type")
  }, Some(
    s"""SELECT event_type, COUNT(*) AS sampled_n FROM events
      |WHERE ${graft.QueryDsl.crossHash60Sql("event_id")} % 10000 <
      |  CASE event_type WHEN 'click' THEN 5000 WHEN 'purchase' THEN 1000
      |       WHEN 'view' THEN 2500 WHEN 'signup' THEN 10000 ELSE 0 END
      |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q35, q38, q39, q41, q42,
    q43, q44)
}
