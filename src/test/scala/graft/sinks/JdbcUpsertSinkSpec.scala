package graft.sinks

import graft.SparkSpecBase
import java.sql.DriverManager

/** Real-JDBC twin of the parquet upsert sink's merge semantics, against
  * the embedded Derby that ships with Spark: update-existing +
  * insert-new (`motorway/contrib/sql_alchemy/intersections.py:51-98`),
  * idempotent under batch replay, and driven from a streaming
  * foreachBatch. */
class JdbcUpsertSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshDb(name: String): String = {
    val url = s"jdbc:derby:memory:$name;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE accounts (id BIGINT PRIMARY KEY, balance DOUBLE, plan VARCHAR(16))")
      st.close()
    } finally conn.close()
    url
  }

  private def readAll(url: String): Map[Long, (Double, String)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT id, balance, plan FROM accounts")
      val out = scala.collection.mutable.Map[Long, (Double, String)]()
      while (rs.next()) out(rs.getLong(1)) = (rs.getDouble(2), rs.getString(3))
      out.toMap
    } finally conn.close()
  }

  test("upsert inserts new keys, updates existing non-key columns, replays idempotently") {
    val url = freshDb("upsert_batch")
    val b1 = Seq((1L, 10.0, "free"), (2L, 20.0, "pro")).toDF("id", "balance", "plan")
    JdbcUpsertSink.upsert(b1, url, "accounts", "id")
    assert(readAll(url) == Map(1L -> (10.0, "free"), 2L -> (20.0, "pro")))

    // overlap: update 2, insert 3; within-batch duplicate of key 3 — last wins
    val b2 = Seq((2L, 25.0, "pro+"), (3L, 30.0, "free"), (3L, 31.0, "pro"))
      .toDF("id", "balance", "plan")
    JdbcUpsertSink.upsert(b2, url, "accounts", "id")
    val afterB2 = readAll(url)
    assert(afterB2(1L) == (10.0, "free"))
    assert(afterB2(2L) == (25.0, "pro+"))
    assert(afterB2(3L)._1 == 31.0 || afterB2(3L)._1 == 30.0) // one of the dupes, exactly once
    assert(afterB2.size == 3)

    // replaying the same batch converges to the same state (idempotent)
    JdbcUpsertSink.upsert(b2, url, "accounts", "id")
    assert(readAll(url) == afterB2)
  }

  test("streaming foreachBatch upserts into Derby across micro-batches") {
    val url = freshDb("upsert_stream")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double, String)](spark, 2)
    val q = input.toDS().toDF("id", "balance", "plan")
      .writeStream
      .outputMode("update")
      .foreachBatch(JdbcUpsertSink.foreachBatchUpsert(url, "accounts", "id") _)
      .start()
    try {
      input.addData((1L, 1.0, "a"), (2L, 2.0, "b"))
      q.processAllAvailable()
      input.addData((2L, 2.5, "b2"), (4L, 4.0, "d"))
      q.processAllAvailable()
      assert(readAll(url) == Map(1L -> (1.0, "a"), 2L -> (2.5, "b2"), 4L -> (4.0, "d")))
    } finally q.stop()
  }
}
