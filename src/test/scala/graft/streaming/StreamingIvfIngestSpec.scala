package graft.streaming

import graft.{SparkSpecBase, Tables}
import graft.QueryDsl.crossHash60
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Streaming IVF ingest: after the q124 batch slice arrives over two
  * micro-batches, occupancy and drift must MATCH the batch twin's
  * maintenance report, and the threshold crossing must surface as a
  * PipelineStats alert. */
class StreamingIvfIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpusSplit() = {
    val c = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"),
        (pmod(crossHash60(col("vec_id")), lit(5)) === 0).as("is_batch"))
    (c.where(!col("is_batch")).select("vec_id", "v"),
      c.where(col("is_batch")).select("vec_id", "v")
        .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1))
  }

  test("two micro-batches reproduce q124's occupancy and drift; alert fires") {
    val (base, batchRows) = corpusSplit()
    assert(batchRows.size >= 2, "test corpus must provide at least two batch vectors")
    val listener = new PipelineStatsListener()
    // threshold below any nonzero drift so the alert path is exercised
    // on this corpus (sf0.001 drift stays under the production 0.05)
    val ing = new StreamingIvfIngest(base, nList = 16, driftThreshold = 1e-9,
      stats = Some((listener, "ivf_ingest")))
    val input = MemoryStream[(Long, Seq[Double])](spark, 4)
    val q = ing.start(input.toDS(), "ivf_ingest_spec")
    val (half1, half2) = batchRows.splitAt(batchRows.size / 2)
    input.addData(half1)
    q.processAllAvailable()
    val midBatchTotal = ing.batchOccupancy.values.sum
    assert(midBatchTotal == half1.size, "first micro-batch occupancy incomplete")
    input.addData(half2)
    q.processAllAvailable()
    q.stop()

    // the streaming report equals the batch twin's (q124 on the same
    // corpus): identical cells, identical integer counts, identical
    // drift doubles (same IEEE chain)
    val batchTwin = graft.queries.Similarity.q124.run(spark, sfDir)
      .select("cent_id", "base_n", "batch_n", "drift")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(ing.report == batchTwin,
      s"streaming report diverges from q124:\n${ing.report}\nvs\n$batchTwin")

    // the drift alert crossed the spec threshold and landed in
    // PipelineStats as a recorded event with the drift payload
    assert(ing.alerted.exists(_ > 1e-9), "no drift alert raised")
    val rec = listener.snapshot.get("ivf_ingest")
    assert(rec.exists(_.failures.nonEmpty), "alert not recorded in PipelineStats")
    assert(rec.get.failures.exists(_.messageId.startsWith("ivf-drift-alert")),
      "recorded event is not the drift alert")
  }

  test("replayed micro-batch ids stay idempotent (at-least-once recovery)") {
    val (base, batchRows) = corpusSplit()
    val ing = new StreamingIvfIngest(base, nList = 16, driftThreshold = 1e9)
    val df = batchRows.toDF("vec_id", "v")
    ing.ingest(df, batchId = 0)
    val once = ing.report
    ing.ingest(df, batchId = 0) // foreachBatch replay of the same batch id
    assert(ing.report == once, "replaying a batch id changed the occupancy")
    assert(ing.alerted.isEmpty, "threshold 1e9 must never alert")
  }
}
