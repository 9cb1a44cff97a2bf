package graft.sources

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-format breadth: the engine's tables round-trip through CSV and
  * JSON-lines (the reference's wire format) with declared schemas, and
  * filters still push into the scans. Parquet is the primary format
  * (every registry query); this proves the other two readers carry the
  * same data faithfully. */
class FormatsSpec extends SparkSpecBase {

  private lazy val base = {
    val dir = s"/tmp/graft_formats_${System.nanoTime()}"
    val e = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
    e.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    e.write.mode("overwrite").json(s"$dir/json")
    (dir, e.count())
  }

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("ts_s", StringType)))

  test("csv round-trips with a declared schema") {
    val (dir, n) = base
    val back = spark.read.schema(schema).option("header", "true").csv(s"$dir/csv")
    assert(back.count() == n)
    val exp = Tables(spark, sfDir).events.agg(sum("event_id")).head().getLong(0)
    assert(back.agg(sum("event_id")).head().getLong(0) == exp)
  }

  test("json-lines round-trips and filters correctly") {
    val (dir, _) = base
    val back = spark.read.schema(schema).json(s"$dir/json")
    val expected = Tables(spark, sfDir).events
      .where(col("event_type") === "purchase").count()
    assert(back.where(col("event_type") === "purchase").count() == expected)
  }

  test("orc round-trips and pushes filters into the scan") {
    val (dir, n) = base
    val e = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    e.write.mode("overwrite").orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
    assert(back.count() == n)
    val q = back.where(col("event_type") === "purchase").select("event_id")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("event_type"),
      "ORC scan did not receive the pushed filter")
    assert(q.count() ==
      Tables(spark, sfDir).events.where(col("event_type") === "purchase").count())
  }
}
