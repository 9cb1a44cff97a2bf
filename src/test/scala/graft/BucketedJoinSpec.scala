package graft

import org.apache.spark.sql.functions._

/** Evidence for SCALE.md's bucketing claim: fact-fact joins on
  * co-bucketed tables plan with NO shuffle exchange — the layout that
  * turns the dominant 100 TB join shuffle into a local zip of buckets. */
class BucketedJoinSpec extends SparkSpecBase {

  test("co-bucketed fact tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("warehouse").toString
    val t = Tables(spark, sfDir)

    t.lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_bucketed")
    t.orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
    // force a shuffle-join shape (no broadcast) to expose the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      val exchangesBelowJoin = plan.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin"))
        .count(_.contains("Exchange hashpartitioning"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(exchangesBelowJoin == 0,
        s"bucketed join must not shuffle its children:\n$plan")
      // and it still computes the right thing
      val expected = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
      assert(joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
        == expected.collect().map(r => (r.getString(0), r.getDouble(1))).toMap)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
