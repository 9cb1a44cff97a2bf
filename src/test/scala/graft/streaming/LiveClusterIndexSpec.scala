package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The live index must agree with the batch clustering exactly, and an
  * at-least-once redelivery of a pair batch must be a no-op. */
class LiveClusterIndexSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed pair batches reproduce the batch CC labels; replay is idempotent") {
    val pairs = graft.queries.Dedup.allPairsJaccard(spark, sfDir, 0.5)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "test corpus has no dup pairs")
    val want = graft.operators.ConnectedComponents
      .minLabelPropagation(
        graft.queries.Dedup.allPairsJaccard(spark, sfDir, 0.5)
          .select(col("a_id"), col("b_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val idx = new LiveClusterIndex
    val input = MemoryStream[(Long, Long)](spark)
    val q = idx.attach(input.toDF().toDF("a_id", "b_id"))
    try {
      val chunks = pairs.grouped(math.max(pairs.size / 3, 1)).toSeq
      chunks.foreach { chunk => input.addData(chunk); q.processAllAvailable() }
      assert(idx.labels == want)
      // redeliver the first chunk (at-least-once): state must not change
      input.addData(chunks.head); q.processAllAvailable()
      assert(idx.labels == want)
    } finally q.stop()
  }
}
