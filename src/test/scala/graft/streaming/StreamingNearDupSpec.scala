package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming MinHash-LSH near-dup: pairs emit as documents arrive,
  * across micro-batches, with bucket-capped state. */
class StreamingNearDupSpec extends SparkSpecBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away home tonight"
  private def nearDup(tail: String) =
    s"the quick brown fox jumps over the lazy dog and runs far away $tail"
  private val unrelated =
    "completely different words about spark catalyst optimizer plans and shuffles"

  test("near-dup pairs emit across batches; unrelated docs do not pair") {
    val input = MemoryStream[(Long, String)](spark, 4)
    val pairs = StreamingNearDup.candidatePairs(input.toDS(), threshold = 0.3)
    val q = pairs.writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()

    // batch 1: the base doc + an unrelated doc — no pairs yet
    input.addData(Seq((1L, base), (5L, unrelated)))
    q.processAllAvailable()
    assert(spark.table("neardup_out").count() == 0)

    // batch 2: a near-dup of doc 1 arrives later — pair (1, 2) emits
    input.addData(Seq((2L, nearDup("yesterday"))))
    q.processAllAvailable()
    val afterB2 = spark.table("neardup_out")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(afterB2 == Set((1L, 2L)), s"got $afterB2")

    // batch 3: another near-dup pairs with BOTH earlier copies
    input.addData(Seq((3L, nearDup("last week"))))
    q.processAllAvailable()
    val afterB3 = spark.table("neardup_out")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(afterB3 == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $afterB3")

    // jaccard values are exact (verified, not estimated)
    val j = spark.table("neardup_out").select("jaccard").as[Double].collect()
    assert(j.forall(x => x >= 0.3 && x <= 1.0))
    q.stop()
  }

  test("same-batch near-dups pair deterministically, exact jaccard matches kernel") {
    val input = MemoryStream[(Long, String)](spark, 4)
    val pairs = StreamingNearDup.candidatePairs(input.toDS(), threshold = 0.3)
    val q = pairs.writeStream.format("memory").queryName("neardup_same")
      .outputMode(OutputMode.Append).start()
    input.addData(Seq((10L, base), (11L, nearDup("tomorrow"))))
    q.processAllAvailable()
    val got = spark.table("neardup_same")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 11L)), s"got $got")
    q.stop()
  }

  test("merge-walk jaccard matches the naive set computation") {
    val a = Array(1L, 3L, 5L, 9L)
    val b = Array(3L, 5L, 7L)
    val expected = 2.0 / 5.0
    assert(StreamingNearDup.jaccardSorted(a, b) == expected)
    assert(StreamingNearDup.jaccardSorted(a, a) == 1.0)
    assert(StreamingNearDup.jaccardSorted(Array.empty[Long], b) == 0.0)
  }
}
