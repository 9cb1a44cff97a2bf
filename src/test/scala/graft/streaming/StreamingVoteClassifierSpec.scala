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
}
