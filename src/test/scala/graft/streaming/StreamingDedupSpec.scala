package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Streaming exact dedup — the incremental twin of q27: a crawl
  * frontier dedups documents AS THEY ARRIVE instead of re-scanning the
  * corpus. `dropDuplicatesWithinWatermark` keys state by content hash
  * and expires it once the watermark passes, so state size is bounded
  * by the dedup horizon (not corpus size) — the property that lets the
  * operator run forever at ingest scale. Duplicates farther apart than
  * the horizon re-emit by design; the batch compaction pass (q27)
  * catches those downstream.
  */
class StreamingDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming dedup emits first occurrence only, with bounded state") {
    val input = MemoryStream[(Timestamp, Long, String)](spark, 2)
    val deduped = input.toDS().toDF("ts", "doc_id", "content_hash")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()

    // three docs, two sharing a content hash inside the horizon
    input.addData(Seq(
      (ts(0), 1L, "hA"), (ts(1), 2L, "hB"), (ts(2), 3L, "hA")))
    q.processAllAvailable()
    val first = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted
    assert(first.sameElements(Array(1L, 2L)), s"got ${first.mkString(",")}")

    // a duplicate of hA arriving long past the horizon re-emits: state
    // for hA expired when the watermark passed ts(2) + 10 min
    input.addData(Seq((ts(40), 4L, "hC")))  // advances watermark to 10:30
    q.processAllAvailable()
    input.addData(Seq((ts(41), 5L, "hA")))
    q.processAllAvailable()
    val all = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted
    assert(all.sameElements(Array(1L, 2L, 4L, 5L)), s"got ${all.mkString(",")}")
    q.stop()
  }

  test("normalized fingerprint (q165's canonical form) dedups case/punct twins in-stream") {
    // the SAME normExpr the batch census (q165) hashes: a re-encoded
    // copy ("  UPPER !! " mangling) must merge with its original as it
    // arrives, not only in the batch compaction pass
    val input = MemoryStream[(Timestamp, Long, String)](spark, 2)
    val deduped = input.toDS().toDF("ts", "doc_id", "text")
      .withColumn("content_hash", md5(graft.queries.Curation10.normExpr(col("text"))))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
    val q = deduped.writeStream.format("memory").queryName("norm_dedup_out")
      .outputMode(OutputMode.Append).start()
    input.addData(Seq(
      (ts(0), 1L, "the quick brown fox"),
      (ts(1), 2L, "  THE QUICK brown FOX !! "), // q165's mangle: same canonical form
      (ts(2), 3L, "the quick brown foxes")))    // genuinely different
    q.processAllAvailable()
    val ids = spark.table("norm_dedup_out").select("doc_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 3L)), s"got ${ids.mkString(",")}")
    q.stop()
  }

  test("dedup state survives checkpointed restart without re-emitting") {
    // memory sinks can't recover a checkpoint — use the file sink, the
    // shape a real ingest job runs (dedup stream → parquet).
    val ckpt = java.nio.file.Files.createTempDirectory("dedup_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("dedup_out").toString
    val input = MemoryStream[(Timestamp, Long, String)](spark, 2)
    def start() = input.toDS().toDF("ts", "doc_id", "content_hash")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    val q1 = start()
    input.addData(Seq((ts(0), 1L, "hA")))
    q1.processAllAvailable()
    q1.stop()

    // restart from the checkpoint: hA is still known state
    val q2 = start()
    input.addData(Seq((ts(1), 2L, "hA"), (ts(2), 3L, "hB")))
    q2.processAllAvailable()
    val ids = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 3L)), s"got ${ids.mkString(",")}")
    q2.stop()
  }
}
