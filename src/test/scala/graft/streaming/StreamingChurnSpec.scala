package graft.streaming

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import StreamingChurn.{ChurnVerdict, CrawlRecord}

/** The live churn monitor must classify a re-crawl exactly as q166's
  * batch reconciliation does: snapshot A streams in as the first crawl,
  * snapshot B (plus tombstones for the vanished docs) as the second,
  * and the second crawl's verdict census per source equals the batch
  * report bit-for-bit. */
class StreamingChurnSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("second-crawl verdict census equals q166's batch reconciliation") {
    val base = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // the q166 derivations, as crawl record streams
    val crawlA = base.filter(_._1 % 10 != 7)
      .map { case (id, src, t) => CrawlRecord(id, src, Some(md5hex(t)), 1L) }
    val inB = base.filter(_._1 % 10 != 3)
      .map { case (id, src, t) =>
        CrawlRecord(id, src, Some(md5hex(if (id % 4 == 1) t + " v2" else t)), 2L) }
    val tombstones = base.filter(_._1 % 10 == 3) // in A (3≠7), gone from B
      .map { case (id, src, _) => CrawlRecord(id, src, None, 2L) }
    val crawlB = inB ++ tombstones

    val input = MemoryStream[CrawlRecord](spark)
    val q = StreamingChurn.verdicts(input.toDS())
      .writeStream.format("memory").queryName("churn_out")
      .outputMode("append").start()
    try {
      input.addData(crawlA.toSeq); q.processAllAvailable()
      input.addData(crawlB.toSeq); q.processAllAvailable()
      val got = spark.table("churn_out").as[ChurnVerdict].collect()
        .filter(_.seq == 2L)
        .groupBy(_.source).map { case (src, vs) =>
          val c = vs.groupBy(_.status).map { case (k, v) => k -> v.size.toLong }
          (src, c.getOrElse("added", 0L), c.getOrElse("removed", 0L),
            c.getOrElse("changed", 0L), c.getOrElse("unchanged", 0L))
        }.toSeq.sortBy(_._1)
      val want = graft.queries.Curation10.q166.run(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("at-least-once replay and stale redelivery are fenced by the seq high-water mark") {
    val recs = Seq(
      CrawlRecord(1L, "s", Some("aa"), 1L),
      CrawlRecord(2L, "s", Some("bb"), 1L))
    val input = MemoryStream[CrawlRecord](spark)
    val fenced = spark.sparkContext.longAccumulator("churn_fenced")
    val q = StreamingChurn.verdicts(input.toDS(), Some(fenced))
      .writeStream.format("memory").queryName("churn_replay")
      .outputMode("append").start()
    try {
      input.addData(recs); q.processAllAvailable()
      // redelivery of the same records, then a genuine change
      input.addData(recs :+ CrawlRecord(1L, "s", Some("cc"), 2L)); q.processAllAvailable()
      // a STALE cross-batch redelivery of doc 1's crawl-1 record: must
      // neither emit a verdict nor resurrect fp=aa (the corruption the
      // fence exists for), proven by the next genuine record being
      // 'unchanged' vs cc, not 'changed' vs aa
      input.addData(Seq(CrawlRecord(1L, "s", Some("aa"), 1L))); q.processAllAvailable()
      input.addData(Seq(CrawlRecord(1L, "s", Some("cc"), 3L))); q.processAllAvailable()
      // tombstone, then a redelivered pre-tombstone record (fenced),
      // then a NEW tombstone observation (absent -> absent)
      input.addData(Seq(CrawlRecord(2L, "s", None, 3L),
        CrawlRecord(2L, "s", Some("bb"), 1L),
        CrawlRecord(2L, "s", None, 4L))); q.processAllAvailable()
      val vs = spark.table("churn_replay").as[ChurnVerdict].collect()
      assert(vs.count(v => v.status == "added") == 2, "replay minted extra added verdicts")
      assert(vs.count(v => v.status == "changed") == 1, "stale redelivery double-counted a change")
      // doc 1's seq=1 record emits exactly once across its three deliveries
      assert(vs.count(v => v.seq == 1L && v.doc_id == 1L) == 1)
      // genuine cc-after-cc is unchanged; doc 2's absent->absent tombstone too
      assert(vs.count(v => v.status == "unchanged") == 2)
      assert(vs.count(v => v.status == "removed") == 1)
      // the fenced pre-tombstone record did not resurrect doc 2
      assert(!vs.exists(v => v.doc_id == 2L && v.seq == 1L && v.status != "added"))
      // the four dropped redeliveries are OBSERVABLE: recs replayed in
      // batch 2 (x2), doc 1's stale batch-3 record, doc 2's
      // pre-tombstone replay — the replay-storm gauge
      assert(fenced.value == 4L, s"fence counter saw ${fenced.value}, expected 4")
    } finally q.stop()
  }

  test("tombstone retention compacts state below the bound; live entries survive") {
    val input = MemoryStream[CrawlRecord](spark)
    // ProcessingTimeTimeout keeps scheduling timeout-sweep micro-batches,
    // so processAllAvailable() would block forever (operator scaladoc):
    // pace with a real trigger and poll the sink/progress under deadline.
    val q = StreamingChurn.verdicts(input.toDS(), tombstoneRetentionMs = Some(2000L))
      .writeStream.format("memory").queryName("churn_ttl")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
      .start()
    def rows() = spark.table("churn_ttl").as[ChurnVerdict].collect().toSeq
    def stateRows() =
      Option(q.lastProgress).map(_.stateOperators.head.numRowsTotal)
    try {
      input.addData(Seq(CrawlRecord(1L, "s", Some("aa"), 1L),
        CrawlRecord(2L, "s", Some("bb"), 1L)))
      pollUntil("both 'added' verdicts")(rows().size == 2)
      input.addData(Seq(CrawlRecord(2L, "s", None, 2L))) // doc 2 removed
      pollUntil("'removed' verdict")(rows().size == 3)
      pollUntil("live + tombstone entries before the horizon")(
        stateRows().contains(2L))
      Thread.sleep(3000) // idle past the 2 s retention horizon; sweeps run
      // a batch for an unrelated doc (and the paced sweep batches) clears
      // timed-out tombstones
      input.addData(Seq(CrawlRecord(3L, "s", Some("cc"), 3L)))
      pollUntil("doc 3 verdict")(rows().exists(_.doc_id == 3L))
      pollUntil("doc 2's tombstone compacts away (doc 1 live + doc 3 remain)")(
        stateRows().exists(_ <= 2L))
      // live doc 1 survived compaction: same fp still classifies unchanged
      input.addData(Seq(CrawlRecord(1L, "s", Some("aa"), 4L)))
      pollUntil("doc 1 seq-4 verdict")(
        rows().exists(v => v.doc_id == 1L && v.seq == 4L))
      assert(rows().find(v => v.doc_id == 1L && v.seq == 4L)
        .exists(_.status == "unchanged"),
        "compaction must not drop LIVE snapshot entries")
      // the documented degrade past the horizon: a stale pre-tombstone
      // redelivery is no longer fenced and resurrects doc 2 as added —
      // exactly the batch-q166-vs-compacted-snapshot semantics. (The
      // crawl-1 'added' verdict for doc 2 shares (doc_id, seq), so count
      // the NEW emission rather than asserting a single row.)
      val before = rows().count(v => v.doc_id == 2L && v.seq == 1L)
      input.addData(Seq(CrawlRecord(2L, "s", Some("bb"), 1L)))
      pollUntil("stale pre-tombstone record re-emits past the horizon")(
        rows().count(v => v.doc_id == 2L && v.seq == 1L) == before + 1)
      assert(rows().filter(v => v.doc_id == 2L && v.seq == 1L)
        .forall(_.status == "added"),
        "past the horizon the stale record re-adds (documented degrade)")
    } finally q.stop()
  }

  test("churn state survives a checkpoint restart between crawls") {
    val dir = java.nio.file.Files.createTempDirectory("churn_ckpt").toString
    val input = MemoryStream[CrawlRecord](spark)
    def start() = StreamingChurn.verdicts(input.toDS())
      .writeStream.format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    val q1 = start()
    input.addData(Seq(
      CrawlRecord(1L, "s", Some("aa"), 1L),
      CrawlRecord(2L, "s", Some("bb"), 1L),
      CrawlRecord(3L, "s", Some("cc"), 1L)))
    q1.processAllAvailable(); q1.stop()

    // restart against the same checkpoint: crawl 2 must classify
    // against the state REBUILT from the store, not a blank slate
    val q2 = start()
    input.addData(Seq(
      CrawlRecord(1L, "s", Some("aa"), 2L), // same fp     -> unchanged
      CrawlRecord(2L, "s", Some("b2"), 2L), // new fp      -> changed
      CrawlRecord(3L, "s", None, 2L),       // tombstone   -> removed
      CrawlRecord(4L, "s", Some("dd"), 2L)  // never seen  -> added
    ))
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(s"$dir/out").as[ChurnVerdict].collect()
      .filter(_.seq == 2L).map(v => v.doc_id -> v.status).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }
}
