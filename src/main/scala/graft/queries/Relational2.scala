package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl._
import org.apache.spark.sql.functions._

/** Second relational batch: multiset set-ops, regex extraction,
  * array/map function family, null-handling conditionals, string
  * function breadth. All oracle-checked. */
object Relational2 {

  private def q(name: String, oracle: String)(f: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame) =
    GraftQuery(name, f, Some(oracle))

  // -- q45: multiset set operations (EXCEPT ALL / INTERSECT ALL) --------
  val q45 = q("q45_multiset_ops",
    """SELECT l_partkey FROM (
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
      |  EXCEPT ALL
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
      |ORDER BY l_partkey""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir).lineitem
    li.where(col("l_returnflag") === "N").select("l_partkey")
      .exceptAll(li.where(col("l_returnflag") === "R").select("l_partkey"))
      .orderBy("l_partkey")
  }

  // -- q46: regex extraction --------------------------------------------
  val q46 = q("q46_regex_extract",
    """SELECT p_partkey,
      |  regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
      |  regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
      |  CAST(regexp_matches(p_name, 'a') AS BOOLEAN) AS has_a
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).part.select(
      col("p_partkey"),
      regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brand_num"),
      regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("type_head"),
      col("p_name").rlike("a").as("has_a"))
      .orderBy("p_partkey")
  }

  // -- q47: array function family ---------------------------------------
  val q47 = q("q47_array_funcs",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |SELECT doc_id,
      |  t[1] AS first_tok,
      |  t[-1] AS last_tok,
      |  array_to_string(t[1:3], '_') AS head3,
      |  array_to_string(list_sort(list_distinct(t)), ' ') AS vocab,
      |  CAST(list_position(t, 'the') AS INTEGER) AS the_pos,
      |  list_contains(t, 'data') AS has_data
      |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val t = split(col("text"), " ")
    Tables(s, dir).documents.select(
      col("doc_id"),
      element_at(t, 1).as("first_tok"),
      element_at(t, -1).as("last_tok"),
      array_join(slice(t, 1, 3), "_").as("head3"),
      array_join(array_sort(array_distinct(t)), " ").as("vocab"),
      coalesce(array_position(t, "the").cast("int"), lit(0)).as("the_pos"),
      array_contains(t, "data").as("has_data"))
      .orderBy("doc_id")
  }

  // -- q48: null-handling conditionals ----------------------------------
  val q48 = q("q48_null_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_flag,
      |  greatest(l_tax, l_discount) AS max_rate,
      |  least(l_tax, l_discount) AS min_rate,
      |  CASE WHEN nullif(l_quantity, 1.0) IS NULL THEN 'single' ELSE 'multi' END AS qty_class
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem.select(
      col("l_orderkey"), col("l_linenumber"),
      coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_or_flag"),
      greatest(col("l_tax"), col("l_discount")).as("max_rate"),
      least(col("l_tax"), col("l_discount")).as("min_rate"),
      when(nullif(col("l_quantity"), lit(1.0)).isNull, "single").otherwise("multi").as("qty_class"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // -- q49: string function breadth (incl. edit distance) ---------------
  val q49 = q("q49_string_funcs",
    """SELECT s_suppkey,
      |  lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS padded_key,
      |  trim(replace(s_name, '#', ' ')) AS clean_name,
      |  reverse(s_name) AS rev_name,
      |  CAST(levenshtein(s_name, 'Supplier') AS INTEGER) AS lev,
      |  CAST(strpos(s_name, '#') AS INTEGER) AS hash_pos,
      |  repeat('*', CAST(s_nationkey % 5 AS INTEGER)) AS stars
      |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    Tables(s, dir).supplier.select(
      col("s_suppkey"),
      lpad(col("s_suppkey").cast("string"), 8, "0").as("padded_key"),
      trim(regexp_replace(col("s_name"), "#", " ")).as("clean_name"),
      reverse(col("s_name")).as("rev_name"),
      levenshtein(col("s_name"), lit("Supplier")).as("lev"),
      locate("#", col("s_name")).as("hash_pos"),
      repeat(lit("*"), (col("s_nationkey") % 5).cast("int")).as("stars"))
      .orderBy("s_suppkey")
  }

  // -- q50: GROUPING SETS with GROUPING() disambiguation ----------------
  // Through the SQL front-end (the engine's full SQL surface; same text
  // runs in both engines modulo the cast).
  val q50 = q("q50_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables(s, dir).orders.createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  // -- q51: interval arithmetic -----------------------------------------
  val q51 = q("q51_interval_arith",
    """SELECT l_orderkey, l_linenumber,
      |  strftime(l_shipdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
      |  strftime(l_shipdate - INTERVAL 1 WEEK, '%Y-%m-%d') AS week_before,
      |  CAST(year(l_shipdate + INTERVAL 6 MONTH) AS INTEGER) AS half_year_later
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2001-10-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .where(col("l_shipdate") >= lit("2001-10-01 00:00:00"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate") + expr("INTERVAL 30 DAY"), "yyyy-MM-dd").as("due_date"),
        date_format(col("l_shipdate") - expr("INTERVAL 1 WEEK"), "yyyy-MM-dd").as("week_before"),
        year(col("l_shipdate") + expr("INTERVAL 6 MONTH")).as("half_year_later"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // -- q52: statistical aggregates --------------------------------------
  // Variance/correlation accumulate order-dependent low bits → round(6)
  // on both sides (values are O(1e4), so this still checks 10 digits).
  val q52 = q("q52_stat_aggs",
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 6) AS sd_qty,
      |  round(var_samp(l_discount), 6) AS var_disc,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_discount")), 6).as("var_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6).as("covar_qty_price"))
      .orderBy("l_returnflag")
  }

  val all: Seq[GraftQuery] = Seq(q45, q46, q47, q48, q49, q50, q51, q52)
}
