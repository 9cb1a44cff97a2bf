package graft.streaming

import graft.SparkSpecBase
import graft.queries.Curation6
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The streaming vote-classifier gate must reproduce the batch query
  * q131 row-for-row on the same documents: the stream is a stateless
  * map under a frozen artifact, so batch and stream verdicts are the
  * same integers. */
class StreamingVoteClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  test("stream verdicts equal batch q131 exactly; two micro-batches; replay-stable") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // same seeds as q131
    val votes = Curation6.voteTable(docs,
      Seq("src0", "src1", "src2"), Seq("src17", "src18", "src19"))
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (firstHalf, secondHalf) = rows.splitAt(rows.size / 2)

    val input = MemoryStream[(Long, String)](spark, 8)
    val q = StreamingVoteClassifier.labeled(input.toDS(), votes)
      .writeStream.format("memory").queryName("vote_stream")
      .outputMode(OutputMode.Append).start()
    input.addData(firstHalf)
    q.processAllAvailable()
    input.addData(secondHalf)
    q.processAllAvailable()
    val got = spark.table("vote_stream")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    q.stop()

    val want = graft.SparkEntry.queries("q131_seed_vote_classifier")(spark, sfDir)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == want, s"stream/batch verdicts diverge: ${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
  }

  // The web-scale artifact contract: a million-term vote table must ride
  // as a broadcast, never as a plan literal — with typedLit the analyzed
  // plan (and every serialized task) carries the whole map; with the
  // broadcast kernel the plan is O(1) in artifact size.
  test("1M-term vote table: plan stays O(1), scoring still exact") {
    import org.apache.spark.sql.functions._
    val votes = spark.range(1000000L).select(
      concat(lit("w"), col("id")).as("word"),
      (col("id") % 3 - 1).cast("long").as("vote"))

    val input = MemoryStream[(Long, String)](spark, 9)
    val labeled = StreamingVoteClassifier.labeled(input.toDS(), votes)
    val planChars = labeled.queryExecution.analyzed.toString.length +
      labeled.queryExecution.logical.toString.length
    assert(planChars < 20000,
      s"plan carries the artifact: $planChars chars for a 1M-term table")

    val q = labeled.writeStream.format("memory").queryName("vote_big")
      .outputMode(OutputMode.Append).start()
    // votes: w0→−1, w1→0, w2→+1 (id%3−1); w999999 (id%3=0)→−1
    input.addData(Seq(
      (1L, "w2 w5 w8 w0"),        // pos 3, neg 1, margin 2 → keep
      (2L, "w0 w3 w999999 zzz"),  // pos 0, neg 3, margin −3 → drop
      (3L, "zzz yyy"),            // no known token → no row
      (4L, null: String)))        // null doc → no row, never an NPE
    q.processAllAvailable()
    val got = spark.table("vote_big")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    q.stop()
    assert(got == Set(
      (1L, 3L, 1L, 2L, "keep"),
      (2L, 0L, 3L, -3L, "drop")), s"big-artifact verdicts wrong: $got")
  }
}
