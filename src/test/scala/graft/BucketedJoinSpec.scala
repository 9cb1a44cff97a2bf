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

  test("BucketedCorpus: ensure-once semantics, content-stamp rebuild, identical rows") {
    val d1 = graft.sources.BucketedCorpus.documents(spark, sfDir)
    // same rows as the raw parquet read
    val raw = Tables(spark, sfDir).documents
    assert(d1.count() == raw.count())
    // order-independent content witness (bit_xor never overflows ANSI)
    def fp(df: org.apache.spark.sql.DataFrame): Long =
      df.select(bit_xor(xxhash64(col("doc_id"), col("text")))).head.getLong(0)
    assert(fp(d1) == fp(raw))
    // second call must NOT rewrite: the _SUCCESS mtime is the witness
    val buckets = spark.sessionState.conf.numShufflePartitions
    val tag = sfDir.split('/').last.replaceAll("[^A-Za-z0-9_]", "p")
    val success = new java.io.File(
      s"/tmp/graft_bucketed/docs_by_docid_${tag}_b$buckets", "_SUCCESS")
    assert(success.exists())
    val mtime = success.lastModified()
    graft.sources.BucketedCorpus.documents(spark, sfDir).count()
    assert(success.lastModified() == mtime, "unchanged corpus must not rewrite")
  }

  test("q166's corpus-vs-corpus doc_id join is exchange-free on the bucketed layout (r16 VERDICT #4)") {
    // force the shuffle-join shape (no broadcast) so the exchange the
    // bucketing eliminates would otherwise be visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q166_snapshot_diff")(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the join's subtree (everything below the first SMJ) must carry
      // no doc_id hash exchange — only the final |sources| aggregate
      // above it may shuffle
      val below = plan.linesIterator.dropWhile(l => !l.contains("SortMergeJoin")).toSeq
      assert(!below.exists(l => l.contains("Exchange hashpartitioning(doc_id")),
        s"bucketed corpus join must not shuffle on doc_id:\n$plan")
      assert(df.collect().nonEmpty)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
