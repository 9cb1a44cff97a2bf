package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream joins with watermarks (SURVEY §2.4 "Joins" row) and
  * checkpoint-restart recovery — the engine-level replacement for the
  * reference's replay-from-ramp fault tolerance. */
class StreamJoinAndRecoverySpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 12:$minute%02d:00")

  test("watermarked stream-stream inner join matches clicks to views") {
    val views = MemoryStream[(Timestamp, Long)](spark, 2)
    val clicks = MemoryStream[(Timestamp, Long)](spark, 2)
    val v = views.toDS().toDF("vts", "vuser").withWatermark("vts", "10 minutes")
    val c = clicks.toDS().toDF("cts", "cuser").withWatermark("cts", "10 minutes")
    val joined = v.join(c,
      col("vuser") === col("cuser") &&
        col("cts") >= col("vts") && col("cts") <= col("vts") + expr("interval 5 minutes"))
      .select(col("vuser").as("user"), col("vts"), col("cts"))
    val q = joined.writeStream.format("memory").queryName("ss_join").start()

    views.addData(Seq((ts(0), 1L), (ts(0), 2L)))
    clicks.addData(Seq((ts(3), 1L), (ts(30), 2L))) // user2's click outside window
    q.processAllAvailable()

    val rows = spark.table("ss_join").select("user").as[Long].collect().toSeq
    assert(rows == Seq(1L))
    q.stop()
  }

  test("query restart from checkpoint resumes offsets without duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("recover").toString
    val input = MemoryStream[(Long, String)](spark, 2)
    def start() = input.toDS().toDF("k", "v").writeStream
      .format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    val q1 = start()
    input.addData(Seq((1L, "a"), (2L, "b")))
    q1.processAllAvailable()
    q1.stop()

    // restart against the same checkpoint; feed more data
    val q2 = start()
    input.addData(Seq((3L, "c")))
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(s"$dir/out").as[(Long, String)].collect().sorted.toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (3L, "c"))) // exactly once, no dupes
  }
}
