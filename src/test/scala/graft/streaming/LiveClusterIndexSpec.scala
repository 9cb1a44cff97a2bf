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

  // The node bound is enforced, not advisory: streaming past it must
  // fail the query loudly (naming the q158 contraction path), never
  // grow driver state silently — and the guard fires BEFORE the
  // overflowing batch mutates the index.
  test("bound overflow fails the query loudly and leaves pre-overflow state intact") {
    val idx = new LiveClusterIndex(maxNodes = 6)
    val input = MemoryStream[(Long, Long)](spark)
    val q = idx.attach(input.toDF().toDF("a_id", "b_id"), "live_cluster_bounded")
    try {
      input.addData(Seq((1L, 2L), (3L, 4L), (5L, 6L))) // exactly 6 nodes: fits
      q.processAllAvailable()
      assert(idx.labels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 5L))
      input.addData(Seq((7L, 8L))) // 2 new nodes: would make 8 > 6
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      val guard = causes(err).find(_.isInstanceOf[IllegalStateException])
      assert(guard.exists(_.getMessage.contains("LiveClusterIndex bound exceeded")),
        s"query failed for the wrong reason: $err")
      assert(guard.exists(_.getMessage.contains("q158")), "guard must name the degrade path")
      // pre-overflow labels intact: a replay after migration is clean
      assert(idx.labels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L, 6L -> 5L))
    } finally q.stop()
  }
}
