package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Third relational batch: window-function breadth (lag/lead, ntile,
  * range frames, first/last/nth), correlated subqueries through the SQL
  * front-end, multi-join analytics (TPC-H Q7/Q9 shapes), time-series
  * gap-filling, histogram binning, conditional/bitwise aggregation,
  * deterministic mode/arg-max, string aggregation, unpivot, an
  * explicitly salted skew join, and null-aware NOT IN.
  *
  * Scale notes: window queries shuffle once on their partition key;
  * the gap-fill day spine is a single-row aggregate exploded (never a
  * driver-side loop); the salted join (q74) is the skew recipe for
  * fact→dim joins whose key histogram is heavy-tailed — salt the fact
  * side, explode the dim side S×, so one hot key spreads over S
  * reducers; correlated subqueries decorrelate to joins in Catalyst
  * (verified: no per-row subplan execution).
  */
object Relational3 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  // -- q55: lag/lead over event streams (inter-event gaps) --------------
  // Deltas in integer microseconds (epoch_us ↔ unix_micros) — exact in
  // both engines; no float time arithmetic.
  val q55 = q("q55_window_lag_lead",
    """SELECT user_id, event_id,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta_us,
      |  lag(event_type) OVER w AS prev_type,
      |  lead(event_type) OVER w AS next_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables(s, dir).events.select(
      col("user_id"), col("event_id"),
      (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("delta_us"),
      lag(col("event_type"), 1).over(w).as("prev_type"),
      lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy("user_id", "event_id")
  }

  // -- q56: distribution window functions (ntile / percent_rank / ...) --
  // percent_rank and cume_dist are int/int ratios in IEEE double —
  // bit-identical across engines. Ordering made total via c_custkey.
  val q56 = q("q56_window_ntile",
    """SELECT c_custkey, c_mktsegment,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  CAST(rank() OVER w AS INTEGER) AS rnk,
      |  CAST(dense_rank() OVER w AS INTEGER) AS drnk
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(s, dir).customer.select(
      col("c_custkey"), col("c_mktsegment"),
      ntile(4).over(w).as("quartile"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"))
      .orderBy("c_custkey")
  }

  // -- q57: RANGE frame — trailing 30-day revenue per customer ----------
  // Value-range frames need a numeric order key: integer day-since-epoch
  // (unix_date ↔ date_diff), so the frame is exact and peer rows (same
  // day) are handled identically in both engines.
  val q57 = q("q57_range_frame",
    """SELECT o_orderkey, o_custkey,
      |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS dayno,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_30d,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val dayno = unix_date(to_date(col("o_orderdate")))
    val w = Window.partitionBy("o_custkey").orderBy(dayno).rangeBetween(-30, 0)
    Tables(s, dir).orders.select(
      col("o_orderkey"), col("o_custkey"),
      dayno.as("dayno"),
      sum(dec("o_totalprice")).over(w).cast("double").as("trailing_30d"),
      count(lit(1)).over(w).as("n_in_window"))
      .orderBy("o_orderkey")
  }

  // -- q58: first/last/nth value over an explicit full frame ------------
  // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
  // the window orders by (l_linenumber, l_partkey): rows tied on both
  // carry the same l_partkey, making the projected value sequence — and
  // hence first/last/nth — engine-independent.
  val q58 = q("q58_first_last",
    """SELECT l_orderkey, l_linenumber,
      |  first_value(l_partkey) OVER w AS first_pk,
      |  last_value(l_partkey) OVER w AS last_pk,
      |  nth_value(l_partkey, 2) OVER w AS second_pk
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir).lineitem.select(
      col("l_orderkey"), col("l_linenumber"),
      first(col("l_partkey")).over(w).as("first_pk"),
      last(col("l_partkey")).over(w).as("last_pk"),
      nth_value(col("l_partkey"), 2).over(w).as("second_pk"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // -- q59: posexplode with ordinal (lateral flatten) -------------------
  // DuckDB 1.0 has no WITH ORDINALITY; the oracle zips two parallel
  // unnests (positional alignment is defined for same-length lists).
  val q59 = q("q59_explode_ordinal",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 100)
      |SELECT doc_id,
      |  CAST(unnest(range(0, len(t))) AS INTEGER) AS pos,
      |  unnest(t) AS word
      |FROM d ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    Tables(s, dir).documents
      .where(col("doc_id") < 100)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .orderBy("doc_id", "pos")
  }

  // -- q60: correlated EXISTS through the SQL front-end -----------------
  // Correlation carries a non-equi date predicate; Catalyst decorrelates
  // to a left-semi join with both conditions (no per-row subplans).
  val q60 = q("q60_correlated_exists",
    """SELECT o_orderkey, o_totalprice FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.orders.createOrReplaceTempView("v60_orders")
    t.lineitem.createOrReplaceTempView("v60_lineitem")
    s.sql(
      """SELECT o_orderkey, o_totalprice FROM v60_orders o
        |WHERE EXISTS (SELECT 1 FROM v60_lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |ORDER BY o_orderkey""".stripMargin)
  }

  // -- q61: correlated scalar subquery (above-brand-average parts) ------
  // The comparison threshold uses the decimal-sum trick so the boundary
  // is bit-identical across engines.
  val q61 = q("q61_correlated_scalar",
    """SELECT p_partkey, p_brand, p_retailprice FROM part p
      |WHERE p_retailprice > (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |                       FROM part p2 WHERE p2.p_brand = p.p_brand)
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).part.createOrReplaceTempView("v61_part")
    s.sql(
      """SELECT p_partkey, p_brand, p_retailprice FROM v61_part p
        |WHERE p_retailprice > (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |                       FROM v61_part p2 WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_partkey""".stripMargin)
  }

  // -- q62: TPC-H Q7 shape — nation-pair shipping volume by year --------
  // All dims broadcast; the only big-big shuffle is lineitem ⋈ orders.
  val q62 = q("q62_nation_volume",
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
       |  $SUM_DISC_PRICE AS revenue
       |FROM lineitem
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN orders   ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
       |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val n1 = t.nation.select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = t.nation.select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    t.lineitem
      .join(broadcast(t.supplier), col("s_suppkey") === col("l_suppkey"))
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t.customer), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .where((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
             (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec("l_extendedprice") * oneMinus(col("l_discount"))).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  // -- q63: TPC-H Q9 shape — profit by supplier nation and year ---------
  // No partsupp table in the test data: supply cost modeled as
  // 0.70 × quantity (exact decimals, so the amount stays exact).
  val q63 = q("q63_profit",
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |           - CAST(0.70 AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part     ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders   ON o_orderkey = l_orderkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |WHERE p_type <> 'PROMO'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val amount = dec("l_extendedprice") * oneMinus(col("l_discount")) -
      lit(0.70).cast(DecimalType(18, 2)) * dec("l_quantity")
    t.lineitem
      .join(broadcast(t.part.where(col("p_type") =!= "PROMO")), col("p_partkey") === col("l_partkey"))
      .join(broadcast(t.supplier), col("s_suppkey") === col("l_suppkey"))
      .join(t.orders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy("nation", "o_year")
  }

  // -- q64: time-series gap-fill (zero-filled daily spine) --------------
  // The day spine comes from a 1-row min/max aggregate exploded into a
  // date sequence — no driver-side loop, and the spine side is tiny so
  // the left join broadcasts the aggregated counts, not the spine.
  val q64 = q("q64_gapfill",
    """WITH e AS (SELECT CAST(ts AS DATE) AS day, value FROM events),
      |b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
      |d AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      |a AS (SELECT day, COUNT(*) AS n_events,
      |        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |      FROM e GROUP BY day)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day,
      |  COALESCE(a.n_events, 0) AS n_events,
      |  COALESCE(a.total_value, 0.0) AS total_value
      |FROM d LEFT JOIN a USING (day) ORDER BY day""".stripMargin) { (s, dir) =>
    val e = Tables(s, dir).events.select(to_date(col("ts")).as("day"), col("value"))
    val spine = e.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val agg = e.groupBy("day").agg(
      count(lit(1)).as("n_events"),
      sumDec(col("value")).as("total_value"))
    spine.join(agg, Seq("day"), "left")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy("day")
  }

  // -- q65: histogram binning (fixed-width buckets) ---------------------
  val q65 = q("q65_histogram",
    """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
      |  COUNT(*) AS n,
      |  min(o_totalprice) AS lo_price,
      |  max(o_totalprice) AS hi_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders
      .groupBy(floor(col("o_totalprice") / 50000.0).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo_price"),
        max(col("o_totalprice")).as("hi_price"),
        sumDec(col("o_totalprice")).as("bucket_total"))
      .orderBy("bucket")
  }

  // -- q66: conditional aggregation (CASE-guarded partial aggs) ---------
  val q66 = q("q66_conditional_agg",
    """SELECT l_returnflag,
      |  COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_heavy,
      |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS discounted_price,
      |  max(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS max_f_qty,
      |  CAST(COUNT(CASE WHEN l_tax = 0.0 THEN 1 END) AS BIGINT) AS n_taxfree
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        count(when(col("l_quantity") > 25, 1)).as("n_heavy"),
        sum(when(col("l_discount") > 0.05, dec("l_extendedprice"))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("discounted_price"),
        max(when(col("l_linestatus") === "F", col("l_quantity"))).as("max_f_qty"),
        count(when(col("l_tax") === 0.0, 1)).as("n_taxfree"))
      .orderBy("l_returnflag")
  }

  // -- q67: deterministic mode + arg-max per group ----------------------
  // mode() tie-breaks differ between engines, so the modal value is
  // derived via count + row_number (ties → smallest nationkey); arg-max
  // uses a unique integer sort key (balance cents ⊕ custkey) so the
  // winner is total-ordered in both engines.
  val q67 = q("q67_mode_argmax",
    """WITH cnt AS (SELECT c_mktsegment, c_nationkey, COUNT(*) AS n FROM customer GROUP BY 1, 2),
      |m AS (SELECT c_mktsegment, c_nationkey, n,
      |        row_number() OVER (PARTITION BY c_mktsegment ORDER BY n DESC, c_nationkey) AS rk
      |      FROM cnt),
      |t AS (SELECT c_mktsegment,
      |        arg_max(c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000 + c_custkey) AS top_name
      |      FROM customer GROUP BY 1)
      |SELECT m.c_mktsegment, m.c_nationkey AS modal_nation, m.n AS modal_n, t.top_name
      |FROM m JOIN t USING (c_mktsegment) WHERE rk = 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val c = Tables(s, dir).customer
    val cnt = c.groupBy("c_mktsegment", "c_nationkey").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("c_mktsegment").orderBy(col("n").desc, col("c_nationkey"))
    val m = cnt.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("c_mktsegment"), col("c_nationkey").as("modal_nation"), col("n").as("modal_n"))
    val key = (dec("c_acctbal") * 100).cast("long") * 10000000L + col("c_custkey")
    val t = c.groupBy("c_mktsegment").agg(max_by(col("c_name"), key).as("top_name"))
    m.join(t, Seq("c_mktsegment")).orderBy("c_mktsegment")
  }

  // -- q68: string aggregation (sorted, distinct, delimited) ------------
  val q68 = q("q68_string_agg",
    """SELECT p_brand,
      |  string_agg(DISTINCT p_type, '|' ORDER BY p_type) AS types,
      |  CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types
      |FROM part GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir).part
      .groupBy("p_brand")
      .agg(
        array_join(array_sort(collect_set(col("p_type"))), "|").as("types"),
        countDistinct(col("p_type")).as("n_types"))
      .orderBy("p_brand")
  }

  // -- q69: unpivot (wide metrics → long form) --------------------------
  val q69 = q("q69_unpivot",
    """WITH base AS (SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, metric, value
      |FROM base UNPIVOT (value FOR metric IN (sum_qty, sum_price))
      |ORDER BY l_returnflag, metric""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        sumDec(col("l_extendedprice")).as("sum_price"))
      .unpivot(Array(col("l_returnflag")), Array(col("sum_qty"), col("sum_price")), "metric", "value")
      .orderBy("l_returnflag", "metric")
  }

  // -- q70: bitwise aggregates ------------------------------------------
  val q70 = q("q70_bitwise_agg",
    """SELECT event_type,
      |  bit_and(event_id) AS band, bit_or(event_id) AS bor, bit_xor(event_id) AS bxor,
      |  COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .groupBy("event_type")
      .agg(
        bit_and(col("event_id")).as("band"),
        bit_or(col("event_id")).as("bor"),
        bit_xor(col("event_id")).as("bxor"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  // -- q74: explicitly salted join (skew recipe, plain-join oracle) -----
  // Fact rows carry salt = orderkey mod S; the dim side is exploded S×.
  // Any hot o_custkey now spreads across S reducers. Results are
  // identical to the unsalted join — the oracle is the plain join.
  val q74 = q("q74_salted_join",
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val S = 8
    val t = Tables(s, dir)
    val facts = t.orders.withColumn("salt", pmod(col("o_orderkey"), lit(S)).cast("int"))
    val dims = t.customer.withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
    facts.join(dims, facts("o_custkey") === dims("c_custkey") && facts("salt") === dims("salt"))
      .groupBy("c_mktsegment")
      .agg(
        sumDec(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  // -- q76: null-aware NOT IN (anti join with null semantics) -----------
  // NOT IN compiles to a null-aware anti join: one NULL in the subquery
  // empties the result. NULLIF keeps the plan shape while the guard
  // value never fires, so the output is the plain anti join.
  val q76 = q("q76_not_in",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, -1) FROM orders WHERE o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    t.customer.createOrReplaceTempView("v76_customer")
    t.orders.createOrReplaceTempView("v76_orders")
    s.sql(
      """SELECT c_custkey, c_name FROM v76_customer
        |WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, -1) FROM v76_orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)
  }

  // -- q90: range join (interval containment) via day-bucket equi-join --
  // "All activity within 2h of each incident": a pure inequality join,
  // which vanilla Spark would plan as BroadcastNestedLoop — O(|a|·|e|).
  // Recipe: bucket events by day, replicate each interval to every day
  // it covers (≤2 here), equi-join on the bucket, then apply the range
  // residual. An event matches an interval in exactly one bucket (its
  // own day), so no post-join dedup is needed. At 100 TB this is one
  // shuffle on the day key with interval replication ∝ window/bucket
  // ratio — the standard interval-join decomposition; the oracle is
  // the plain inequality join.
  val q90 = q("q90_range_join",
    """WITH a AS (SELECT event_id AS win_id, ts AS w_start, ts + INTERVAL 2 HOURS AS w_end
      |           FROM events WHERE event_id % 97 = 0)
      |SELECT win_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM a JOIN events e ON e.ts >= a.w_start AND e.ts < a.w_end
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val e = t.events.select(col("ts"), col("value"), unix_date(to_date(col("ts"))).as("bucket"))
    val anchors = t.events
      .where(pmod(col("event_id"), lit(97)) === 0)
      .select(col("event_id").as("win_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
      .withColumn("bucket",
        explode(sequence(unix_date(to_date(col("w_start"))), unix_date(to_date(col("w_end"))))))
    anchors.join(e, Seq("bucket"))
      .where(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy("win_id")
      .agg(count(lit(1)).as("n_events"), sumDec(col("value")).as("total_value"))
      .orderBy("win_id")
  }

  // -- q91: interval OVERLAP self-join (replicate + dedup-by-bucket) ----
  // Overlapping incident windows. Both sides replicate across their
  // covered day buckets, so an overlapping pair can meet in several
  // buckets; the classic dedup rule — count the pair only in the bucket
  // of max(start1, start2), the day the overlap begins — keeps each
  // pair exactly once with no post-join distinct. The oracle is the
  // plain quadratic self-join.
  val q91 = q("q91_interval_overlap",
    """WITH a AS (SELECT event_id AS win_id, ts AS s, ts + INTERVAL 2 HOURS AS e
      |           FROM events WHERE event_id < 200)
      |SELECT x.win_id AS a_id, y.win_id AS b_id,
      |  CAST(date_diff('microseconds', greatest(x.s, y.s), least(x.e, y.e)) AS BIGINT) AS overlap_us
      |FROM a x JOIN a y ON x.win_id < y.win_id AND x.s < y.e AND y.s < x.e
      |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
    val anchors = Tables(s, dir).events
      .where(col("event_id") < 200)
      .select(col("event_id").as("win_id"), col("ts").as("s"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("e"))
    def repl(side: String) = anchors
      .select(col("win_id").as(s"${side}_id"), col("s").as(s"${side}_s"), col("e").as(s"${side}_e"))
      .withColumn("bucket",
        explode(sequence(unix_date(to_date(col(s"${side}_s"))), unix_date(to_date(col(s"${side}_e"))))))
    repl("a").join(repl("b"), Seq("bucket"))
      .where(col("a_id") < col("b_id") &&
        col("a_s") < col("b_e") && col("b_s") < col("a_e") &&
        col("bucket") === unix_date(to_date(greatest(col("a_s"), col("b_s")))))
      .select(col("a_id"), col("b_id"),
        (unix_micros(least(col("a_e"), col("b_e"))) -
          unix_micros(greatest(col("a_s"), col("b_s")))).as("overlap_us"))
      .orderBy("a_id", "b_id")
  }

  // -- q97: range join through the NATIVE operator ----------------------
  // Same semantics as q90, executed by graft.plans.RangeJoinExec
  // (broadcast interval index, O(log m + matches) probes) instead of
  // the day-bucket decomposition — the custom-exec tier for interval
  // sides small enough to broadcast. Oracle identical to q90's.
  val q97 = q("q97_range_join_native",
    """WITH a AS (SELECT event_id AS win_id, ts AS w_start, ts + INTERVAL 2 HOURS AS w_end
      |           FROM events WHERE event_id % 97 = 0)
      |SELECT win_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM a JOIN events e ON e.ts >= a.w_start AND e.ts < a.w_end
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val t = Tables(s, dir)
    val e = t.events.select(col("ts"), col("value"))
    val anchors = t.events
      .where(pmod(col("event_id"), lit(97)) === 0)
      .select(col("event_id").as("win_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
    graft.plans.RangeJoinApi.join(e, anchors, "ts", "w_start", "w_end")
      .groupBy("win_id")
      .agg(count(lit(1)).as("n_events"), sumDec(col("value")).as("total_value"))
      .orderBy("win_id")
  }

  val all: Seq[GraftQuery] = Seq(q55, q56, q57, q58, q59, q60, q61, q62, q63,
    q64, q65, q66, q67, q68, q69, q70, q74, q76, q90, q91, q97)
}
