package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish tables (TESTDATA.md).
  *
  * Plain parquet scans: Catalyst pushes predicates into the scan
  * (`PushedFilters`) and prunes columns (`ReadSchema`), so every query in
  * [[graft.Queries]] only reads the bytes it needs — the property that
  * matters at 100 TB.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = {
    Tables.evictStopped()
    Tables.resolved.getOrElseUpdate((spark, dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` arrives in whatever physical form the generator used —
    * TIMESTAMP(NANOS) (no native Spark type: read as nanos-since-epoch
    * and truncate to micros with integer `div`, matching DuckDB's ns→us
    * floor) or micros without `isAdjustedToUTC` (Spark 4 infers
    * TIMESTAMP_NTZ, which `unix_micros`/`unix_millis` reject). Both are
    * normalized to TIMESTAMP here, once, so every query sees one type;
    * the session timezone is UTC, so the NTZ wall-clock reading is the
    * same instant the generator wrote.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) file
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df // already TIMESTAMP
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Resolved-relation cache, keyed per (session, dir, table): parquet
    * resolution (file listing + footer schema read) costs tens of ms
    * per call and the result — an analyzed immutable plan — is fully
    * reusable. This is what a catalog/metastore provides on a real
    * cluster; the test dirs are immutable, so no invalidation is
    * needed. Caches the PLAN, not data: every query still scans. */
  private val resolved =
    new scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]

  /** Drop entries whose session has been stopped: keeps long-lived
    * multi-session processes (test harnesses, notebook servers) from
    * retaining dead sessions and their analyzed plans forever, and
    * guarantees a stopped session's plans are never handed back. The
    * map is catalog-sized, so the sweep is O(cached tables). */
  private def evictStopped(): Unit =
    resolved.keysIterator.foreach { k =>
      if (k._1.sparkContext.isStopped) resolved.remove(k)
    }
}
