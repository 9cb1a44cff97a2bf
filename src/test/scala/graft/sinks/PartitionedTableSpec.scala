package graft.sinks

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class PartitionedTableSpec extends SparkSpecBase {

  test("partitioned writes produce pruned scans (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("ptable").toString + "/events"
    val sink = new PartitionedTableSink(dir, Seq("event_type"), Seq("ts"))
    sink.write(Tables(spark, sfDir).events)

    val q = sink.read(spark).where(col("event_type") === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    // partition filter reaches the file index — only the purchase
    // directory is read, not filtered post-scan
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"), plan)
    val expected = Tables(spark, sfDir).events.where(col("event_type") === "purchase").count()
    assert(q.count() == expected)
    // directory layout is the partition scheme
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.exists(_.startsWith("event_type=")), dirs.mkString(","))
  }

  test("dynamic partition overwrite rewrites only touched partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ptable2").toString + "/t"
    val sink = new PartitionedTableSink(dir, Seq("day"))
    sink.write(Seq(("a", "d1"), ("b", "d2")).toDF("v", "day"))
    sink.write(Seq(("b2", "d2")).toDF("v", "day")) // touches only d2
    val got = sink.read(spark).as[(String, String)].collect().toSet
    assert(got == Set(("a", "d1"), ("b2", "d2")))
  }

  test("streaming dedup within watermark drops replayed ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    import spark.implicits._
    val input = MemoryStream[(String, Timestamp)](spark, 2)
    val deduped = input.toDS().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t0 = Timestamp.valueOf("2024-01-01 09:00:00")
    input.addData(Seq(("m1", t0), ("m2", t0)))
    q.processAllAvailable()
    input.addData(Seq(("m1", t0), ("m3", t0))) // m1 redelivered -> dropped
    q.processAllAvailable()
    assert(spark.table("dedup_out").select("id").distinct().count() == 3)
    assert(spark.table("dedup_out").count() == 3)
    q.stop()
  }
}
