package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import java.sql.{Connection, DriverManager}

/** JDBC upsert sink — the reference's SQL-database intersection
  * (`motorway/contrib/sql_alchemy/intersections.py:51-98`) done
  * Spark-side: per batch, dedupe rows by primary key (last wins, like
  * the reference's dict keyed by pk), SELECT the keys that already
  * exist, UPDATE their non-key columns, bulk-INSERT the rest — all in
  * one transaction per partition, so a replayed batch converges to the
  * same state (idempotent upsert, the exactly-once building block).
  *
  * Scale shape: the batch is repartitioned BY KEY first, so each key is
  * written by exactly one task and tasks never contend on rows; each
  * task holds one JDBC connection and uses batched prepared statements
  * (addBatch/executeBatch) — N parallel bulk writers, not row-at-a-time
  * autocommit. Works against any JDBC URL; specs use the embedded Derby
  * that ships with Spark (single-JVM memory URL — a cluster deployment
  * points at a database server instead).
  */
object JdbcUpsertSink {

  /** Upsert `df` into `table` keyed on `keyCol`. The table must exist
    * with matching column names (the reference optionally creates it;
    * DDL is deliberately left to the caller — type mapping policy does
    * not belong in the write path). */
  def upsert(df: DataFrame, url: String, table: String, keyCol: String): Unit = {
    val cols = df.columns.toSeq
    require(cols.contains(keyCol), s"key column $keyCol not in ${cols.mkString(",")}")
    val nonKey = cols.filterNot(_ == keyCol)
    df.repartition(col(keyCol)).foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) writePartition(rows, url, table, keyCol, cols, nonKey)
    }
  }

  /** `foreachBatch` adapter for streaming upserts. */
  def foreachBatchUpsert(url: String, table: String, keyCol: String)(
      batch: DataFrame, batchId: Long): Unit =
    upsert(batch, url, table, keyCol)

  private def writePartition(rows: Iterator[Row], url: String, table: String,
      keyCol: String, cols: Seq[String], nonKey: Seq[String]): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      // last-wins dedupe by key inside the batch partition
      val byKey = scala.collection.mutable.LinkedHashMap[Any, Row]()
      rows.foreach { r => byKey(r.get(r.fieldIndex(keyCol))) = r }
      val existing = existingKeys(conn, table, keyCol, byKey.keys.toSeq)

      if (nonKey.nonEmpty) {
        val upd = conn.prepareStatement(
          s"UPDATE $table SET ${nonKey.map(c => s"$c = ?").mkString(", ")} WHERE $keyCol = ?")
        try {
          var n = 0
          byKey.foreach { case (k, r) =>
            if (existing.contains(k)) {
              nonKey.zipWithIndex.foreach { case (c, i) =>
                upd.setObject(i + 1, r.get(r.fieldIndex(c))) }
              upd.setObject(nonKey.size + 1, k)
              upd.addBatch(); n += 1
            }
          }
          if (n > 0) upd.executeBatch()
        } finally upd.close()
      }

      val ins = conn.prepareStatement(
        s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})")
      try {
        var n = 0
        byKey.foreach { case (k, r) =>
          if (!existing.contains(k)) {
            cols.zipWithIndex.foreach { case (c, i) =>
              ins.setObject(i + 1, r.get(r.fieldIndex(c))) }
            ins.addBatch(); n += 1
          }
        }
        if (n > 0) ins.executeBatch()
      } finally ins.close()
      conn.commit()
    } catch {
      case e: Throwable => try conn.rollback() finally (); throw e
    } finally conn.close()
  }

  /** One IN-list probe per chunk of keys (the reference's single
    * `pk IN (...)` select, chunked to keep statements bounded). */
  private def existingKeys(conn: Connection, table: String, keyCol: String,
      keys: Seq[Any]): Set[Any] = {
    val out = scala.collection.mutable.HashSet[Any]()
    keys.grouped(500).foreach { chunk =>
      val st = conn.prepareStatement(
        s"SELECT $keyCol FROM $table WHERE $keyCol IN (${chunk.map(_ => "?").mkString(",")})")
      try {
        chunk.zipWithIndex.foreach { case (k, i) => st.setObject(i + 1, k) }
        val rs = st.executeQuery()
        while (rs.next()) out += rs.getObject(1)
      } finally st.close()
    }
    out.toSet
  }
}
