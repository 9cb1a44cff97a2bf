package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Standing-query BM25 scoring: stateless per-batch map, frozen base
  * statistics, scores replayed exactly by a JVM reference of the same
  * formula chain. */
class StreamingBm25Spec extends SparkSpecBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "spark joins windows and streams with hash tables"),
    (2L, "a window over a stream of joins"),
    (3L, "nothing relevant here at all"),
    (4L, "hash hash hash join")).toSeq
  private val queries = Seq(
    10L -> Seq("join", "window"),
    11L -> Seq("hash"),
    12L -> Seq("absentterm"))

  /** JVM replay of the frozen-stats scoring chain (same op order). */
  private def reference(text: String): Seq[(Long, Double)] = {
    val baseToks = base.map(_._2.split(" ").toSeq)
    val nDocs = base.size.toLong
    val totDl = baseToks.map(_.size.toLong).sum
    val avgdl = totDl.toDouble / nDocs.toDouble
    val df = queries.flatMap(_._2).distinct.sorted
      .map(t => t -> baseToks.count(_.contains(t)).toLong).toMap
    val toks = text.split(" ").toSeq
    val dl = toks.size.toDouble
    queries.map { case (qid, ts) =>
      val score = ts.sorted.foldLeft(BigDecimal(0).setScale(9)) { (acc, t) =>
        val tf = toks.count(_ == t).toDouble
        val dfr = df.getOrElse(t, 0L).toDouble
        val idf = (nDocs.toDouble - dfr + 0.5) / (dfr + 0.5) + 1.0
        val sat = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        val c = if (tf > 0)
          BigDecimal(math.round(idf * sat * 1e9) / 1e9).setScale(9)
        else BigDecimal(0).setScale(9)
        acc + c
      }.toDouble
      qid -> score
    }.filter(_._2 > 0.0)
  }

  test("arriving docs score against standing queries; frozen stats; exact replay") {
    val baseDf = base.toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)](spark, 4)
    val scored = StreamingBm25.standingQueryScores(input.toDS(), baseDf, queries)
    val q = scored.writeStream.format("memory").queryName("bm25_standing")
      .outputMode(OutputMode.Append).start()
    val arriving = Seq(
      (100L, "a fresh join against a window"),
      (101L, "hash join galore hash"),
      (102L, "completely unrelated text"),
      (103L, null: String)) // null doc must emit nothing, never fail the query
    input.addData(arriving)
    q.processAllAvailable()
    val got = spark.table("bm25_standing").as[(Long, Long, Double)]
      .collect().toSet
    q.stop()
    val want = arriving.filter(_._2 != null).flatMap { case (id, text) =>
      reference(text).map { case (qid, s) => (id, qid, s) } }.toSet
    assert(got == want, s"streaming scores diverge:\n$got\nvs\n$want")
    // the absent-term standing query never fires; unrelated docs emit nothing
    assert(!got.exists(_._2 == 12L))
    assert(!got.exists(_._1 == 102L))
  }

  test("replaying the same batch yields identical scores (stateless)") {
    val baseDf = base.toDF("doc_id", "text")
    def runOnce(name: String): Set[(Long, Long, Double)] = {
      val input = MemoryStream[(Long, String)](spark, 4)
      val q = StreamingBm25.standingQueryScores(input.toDS(), baseDf, queries)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      input.addData(Seq((200L, "join window join")))
      q.processAllAvailable()
      val got = spark.table(name).as[(Long, Long, Double)].collect().toSet
      q.stop()
      got
    }
    assert(runOnce("bm25_replay_a") == runOnce("bm25_replay_b"))
  }
}
