package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import StreamingFrontier.{FrontierRecord, FrontierVerdict}

/** The live frontier gate must agree with q169's batch census: per
  * source, `fetch` verdicts == n_canon_distinct, total verdicts ==
  * n_urls — and the seq fence must make redelivery harmless. */
class StreamingFrontierSpec extends SparkSpecBase {
  import spark.implicits._

  test("fetch verdicts reproduce q169's per-source canonical counts across micro-batches") {
    val recs = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"),
        graft.queries.Curation11.deriveUrl(col("doc_id"), col("source")).as("url"))
      .as[(Long, String, String)].collect().sortBy(_._1)
      .map { case (id, src, url) => FrontierRecord(url, src, id) }
    val chunks = recs.grouped(math.max(recs.length / 3, 1)).toSeq

    val input = MemoryStream[FrontierRecord](spark, 4)
    val q = StreamingFrontier.verdicts(input.toDS())
      .writeStream.format("memory").queryName("frontier_out")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      val got = spark.table("frontier_out").as[FrontierVerdict].collect()
      val bySource = got.groupBy(_.source).map { case (s, vs) =>
        (s, vs.length.toLong, vs.count(_.fetch).toLong)
      }.toSeq.sortBy(_._1)
      val want = graft.queries.Curation11.q169.run(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
      assert(bySource == want,
        "streaming gate must match the batch census (n_urls, n_canon_distinct)")
      assert(!got.exists(_.redelivered), "clean delivery: nothing fenced")
      // the admitted copy per canonical key is the FIRST in seq order
      got.groupBy(_.canon).foreach { case (c, vs) =>
        assert(vs.count(_.fetch) == 1, s"$c fetched ${vs.count(_.fetch)} times")
        assert(vs.minBy(_.seq).fetch, s"$c did not admit the first arrival")
      }
    } finally q.stop()
  }

  test("idle retention compacts a page's entry; a post-horizon variant re-admits (re-visit degrade)") {
    val input = MemoryStream[FrontierRecord](spark, 4)
    // ProcessingTimeTimeout keeps scheduling sweep batches — pace with a
    // real trigger and poll under deadline (operator scaladoc).
    val q = StreamingFrontier.verdicts(input.toDS(), idleRetentionMs = Some(2000L))
      .writeStream.format("memory").queryName("frontier_ttl")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
      .start()
    def rows() = spark.table("frontier_ttl").as[FrontierVerdict].collect().toSeq
    def stateRows() =
      Option(q.lastProgress).map(_.stateOperators.head.numRowsTotal)
    try {
      input.addData(Seq(FrontierRecord("http://x.com/p", "s", 1),
        FrontierRecord("https://www.x.com/p/", "s", 2)))
      pollUntil("fetch + skip verdicts")(rows().size == 2)
      pollUntil("one canonical entry in state")(stateRows().contains(1L))
      Thread.sleep(3000) // page idle past the 2 s horizon; sweeps run
      input.addData(Seq(FrontierRecord("x.com/q", "s", 3)))
      pollUntil("q's verdict")(rows().exists(_.seq == 3L))
      pollUntil("p's idle entry compacts away")(stateRows().exists(_ <= 1L))
      // the documented degrade: a post-horizon variant of p re-admits
      input.addData(Seq(FrontierRecord("x.com/p?utm_source=b", "s", 4)))
      pollUntil("p re-admits")(rows().exists(_.seq == 4L))
      assert(rows().find(_.seq == 4L).exists(_.fetch),
        "post-horizon variant must re-fetch (one extra fetch per horizon)")
    } finally q.stop()
  }

  test("redelivery fence: replays re-emit their original verdict and never re-fetch") {
    def rec(url: String, seq: Long) = FrontierRecord(url, "s", seq)
    // two variants of one page + one distinct page
    val b1 = Seq(rec("http://x.com/p", 1), rec("https://www.x.com/p/", 2),
      rec("x.com/q?utm_source=a", 3))
    // replay of the fetched copy (1) and a skipped copy (2), plus a
    // genuinely new variant of p (4) and a new page (5)
    val b2 = Seq(rec("http://x.com/p", 1), rec("https://www.x.com/p/", 2),
      rec("x.com/p#frag", 4), rec("x.com/r", 5))
    val fenced = spark.sparkContext.longAccumulator("frontier_fenced")
    val input = MemoryStream[FrontierRecord](spark, 4)
    val q = StreamingFrontier.verdicts(input.toDS(), Some(fenced))
      .writeStream.format("memory").queryName("frontier_replay")
      .outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val vs = spark.table("frontier_replay").as[FrontierVerdict].collect()
      assert(vs.length == b1.size + b2.size, "every delivery gets a verdict")
      assert(fenced.value == 2L, s"fence saw ${fenced.value}, want 2")
      // originals re-emitted verbatim: seq 1 stays fetch, seq 2 stays skip
      assert(vs.filter(v => v.seq == 1L).forall(_.fetch))
      assert(vs.filter(v => v.seq == 2L).forall(!_.fetch))
      assert(vs.filter(v => v.seq == 1L && v.redelivered).length == 1)
      // the new variant of p skips (page already admitted); r fetches
      assert(!vs.find(_.seq == 4L).get.fetch)
      assert(vs.find(_.seq == 5L).get.fetch)
      // exactly one fetch per canonical page, ever
      vs.groupBy(_.canon).foreach { case (c, g) =>
        assert(g.count(v => v.fetch && !v.redelivered) == 1, s"$c fetched twice")
      }
    } finally q.stop()
  }
}
