package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming bloom-prefiltered incremental ingest: confirmed span hits
  * emit as documents arrive; the base corpus is a static sketch + span
  * relation, never re-shuffled per batch; no streaming state. */
class StreamingBloomIngestSpec extends SparkSpecBase {
  import spark.implicits._

  // 10-token docs → three 8-token spans each; doc 101 shares its text
  // with base doc 1, doc 102 shares nothing.
  private val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val other = "one two three four five six seven eight nine ten"
  private val unrelated = "red orange yellow green blue indigo violet umber slate coral"

  test("arriving docs emit exactly the spans shared with the base; others emit nothing") {
    val base = Seq((1L, shared), (2L, other)).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)](spark, 4)
    val hits = StreamingBloomIngest.contaminatedSpans(input.toDS(), base)
    val q = hits.writeStream.format("memory").queryName("bloom_ingest")
      .outputMode(OutputMode.Append).start()

    // batch 1: one contaminated doc, one clean doc
    input.addData(Seq((101L, shared), (102L, unrelated)))
    q.processAllAvailable()
    val b1 = spark.table("bloom_ingest").as[(Long, String)].collect().toSet
    // the shared 10-token text has exactly 3 distinct 8-token spans
    assert(b1.map(_._1) == Set(101L), s"got $b1")
    assert(b1.size == 3, s"expected 3 shared spans, got ${b1.size}: $b1")
    assert(b1.forall { case (_, sp) => shared.contains(sp) })

    // batch 2: a doc overlapping base doc 2 on a suffix window only
    val partial = "zzz two three four five six seven eight nine ten" // spans 2..3 of `other`
    input.addData(Seq((103L, partial)))
    q.processAllAvailable()
    val b2 = spark.table("bloom_ingest").as[(Long, String)].collect().toSet -- b1
    assert(b2.map(_._1) == Set(103L), s"got $b2")
    assert(b2.size == 2, s"expected the 2 base-aligned suffix spans, got $b2")
    assert(b2.forall { case (_, sp) => other.contains(sp) })
    q.stop()
  }

  test("replaying the same batch yields the same hits (stateless, deterministic)") {
    val base = Seq((1L, shared)).toDF("doc_id", "text")
    def runOnce(name: String): Set[(Long, String)] = {
      val input = MemoryStream[(Long, String)](spark, 4)
      val q = StreamingBloomIngest.contaminatedSpans(input.toDS(), base)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      input.addData(Seq((201L, shared), (202L, unrelated)))
      q.processAllAvailable()
      val got = spark.table(name).as[(Long, String)].collect().toSet
      q.stop()
      got
    }
    val first = runOnce("bloom_replay_a")
    val second = runOnce("bloom_replay_b")
    assert(first == second && first.nonEmpty, s"replay diverged: $first vs $second")
  }
}
