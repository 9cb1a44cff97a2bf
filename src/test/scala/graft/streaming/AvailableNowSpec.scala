package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Trigger.AvailableNow run-to-completion: the Spark mapping of the
  * reference's periodic full/incremental scans (Recurly hourly ramps,
  * Salesforce SOQL polls — SURVEY.md §2.3). Each invocation drains
  * everything new since the checkpoint and STOPS; re-running later
  * processes only data that arrived in between — scheduled incremental
  * batches with streaming-grade exactly-once bookkeeping. */
class AvailableNowSpec extends SparkSpecBase {
  import spark.implicits._

  test("repeated AvailableNow runs process exactly the new files") {
    val base = s"/tmp/graft_availnow_${System.nanoTime()}"
    val (in, ckpt, out) = (s"$base/in", s"$base/ckpt", s"$base/out")
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").parquet(in)
    runOnce()
    assert(spark.read.parquet(out).count() == 2)

    // second batch of source data arrives between scheduled runs
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(in)
    runOnce()
    val rows = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(1L, 2L, 3L)) // no reprocessing of files 1-2
  }
}
