package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The live admission gate must admit exactly `cap` documents per
  * source — the first arrivals in delivery (`seq`) order — keep
  * counting across micro-batches, and under the engine's at-least-once
  * delivery model a REDELIVERED record (same seq, any later batch) must
  * re-emit its original verdict without consuming a cap slot. */
class StreamingSourceCapSpec extends SparkSpecBase {
  import spark.implicits._
  import StreamingSourceCap.{CapRecord, Verdict}

  private def run(chunks: Seq[Seq[CapRecord]], cap: Int,
      fenced: Option[org.apache.spark.util.LongAccumulator] = None,
      name: String = "cap_out"): Seq[Verdict] = {
    val input = MemoryStream[CapRecord](spark, 4)
    val q = StreamingSourceCap.admissions(input.toDS(), cap, fenced)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      spark.table(name).as[Verdict].collect().toSeq
    } finally q.stop()
  }

  test("admits the first cap arrivals per source across micro-batches; verdicts for all") {
    val Cap = 100
    val rows = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
      .zipWithIndex.map { case ((id, src), i) => CapRecord(id, src, i.toLong) }
    val chunks = rows.grouped(math.max(rows.size / 3, 1)).toSeq
    val got = run(chunks, Cap)
    assert(got.size == rows.size, "every document needs a verdict row")
    assert(!got.exists(_.redelivered), "clean delivery: nothing fenced")
    // exactly min(cap, n) admitted per source
    val bySource = rows.groupBy(_.source).view.mapValues(_.size).toMap
    val admitted = got.filter(_.admitted).groupBy(_.source).view.mapValues(_.size).toMap
    bySource.foreach { case (src, n) =>
      assert(admitted.getOrElse(src, 0) == math.min(Cap, n),
        s"$src admitted ${admitted.getOrElse(src, 0)} of $n under cap $Cap")
    }
    // the admitted set is the FIRST cap in seq order: replay driver-side
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val expectAdmitted = rows.sortBy(_.seq).flatMap { r =>
      val n = counts.getOrElse(r.source, 0)
      if (n < Cap) { counts(r.source) = n + 1; Some(r.doc_id) } else None
    }.toSet
    assert(got.filter(_.admitted).map(_.doc_id).toSet == expectAdmitted,
      "admission must be first-arrivals in seq order")
    // rejects carry the saturated counter (audit surface)
    got.filterNot(_.admitted).foreach { v =>
      assert(v.n_admitted == math.min(Cap, bySource(v.source)),
        s"${v.source} reject row counter wrong: ${v.n_admitted}")
    }
  }

  test("redelivery fence: a replayed record re-emits its verdict without consuming a slot") {
    val Cap = 3
    val src = "replay.example"
    def rec(id: Long, seq: Long) = CapRecord(id, src, seq)
    // batch 1: ids 1..4 → 1,2,3 admitted, 4 rejected (cap 3)
    val b1 = Seq(rec(1, 10), rec(2, 11), rec(3, 12), rec(4, 13))
    // batch 2: SQS-visibility-style replay of an admitted (2) and a
    // rejected (4) doc with their ORIGINAL seqs, interleaved with two
    // genuine new deliveries (5, 6) — both must be rejected (cap full),
    // which only happens if the replays consumed no slots
    val b2 = Seq(rec(2, 11), rec(5, 14), rec(4, 13), rec(6, 15))
    val fenced = spark.sparkContext.longAccumulator("fenced")
    val got = run(Seq(b1, b2), Cap, Some(fenced), name = "cap_replay")
    val byKey = got.groupBy(v => (v.doc_id, v.redelivered))

    // original verdicts re-emitted, flagged, slotless
    val re2 = byKey((2L, true)).head
    assert(re2.admitted, "redelivered admitted doc must stay admitted")
    val re4 = byKey((4L, true)).head
    assert(!re4.admitted, "redelivered rejected doc must stay rejected")
    assert(fenced.value == 2L, s"fence counter saw ${fenced.value}, want 2")

    // cap occupancy unchanged: exactly 3 admitted overall, and the two
    // genuinely-new docs were rejected because the cap was already full
    assert(got.count(v => v.admitted && !v.redelivered) == 3)
    assert(!byKey((5L, false)).head.admitted && !byKey((6L, false)).head.admitted,
      "replays must not free or consume slots for later genuine docs")
    // every delivery (genuine + replay) got a verdict row
    assert(got.size == b1.size + b2.size)
  }

  test("idle retention drops an idle source's entry; the returning source draws a fresh epoch budget") {
    val Cap = 1
    val input = MemoryStream[CapRecord](spark, 4)
    // ProcessingTimeTimeout keeps scheduling timeout-sweep micro-batches,
    // so processAllAvailable() would block forever (operator scaladoc):
    // pace with a real trigger and poll the sink/progress under deadline.
    val q = StreamingSourceCap.admissions(input.toDS(), Cap,
        idleRetentionMs = Some(2000L))
      .writeStream.format("memory").queryName("cap_ttl")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
      .start()
    def rows() = spark.table("cap_ttl").as[Verdict].collect().toSeq
    def stateRows() =
      Option(q.lastProgress).map(_.stateOperators.head.numRowsTotal)
    try {
      input.addData(Seq(CapRecord(1, "s", 10), CapRecord(2, "s", 11)))
      pollUntil("both verdicts (1 admitted, 2 rejected)")(rows().size == 2)
      pollUntil("one source entry in state")(stateRows().contains(1L))
      Thread.sleep(3000) // source "s" idle past the 2 s horizon; sweeps run
      // traffic on another source; the timed-out "s" entry is swept
      input.addData(Seq(CapRecord(7, "t", 1)))
      pollUntil("doc 7 verdict")(rows().exists(_.doc_id == 7L))
      pollUntil("idle source entry compacts away")(stateRows().exists(_ <= 1L))
      // the documented semantic: a returning source opens a NEW epoch
      input.addData(Seq(CapRecord(3, "s", 12)))
      pollUntil("doc 3 verdict")(rows().exists(_.doc_id == 3L))
      val vs = rows()
      assert(vs.find(_.doc_id == 3L).exists(_.admitted),
        "post-horizon return must draw a fresh budget (per-epoch cap)")
      assert(vs.count(v => v.source == "s" && v.admitted) == 2, "one admit per epoch")
    } finally q.stop()
  }

  test("within-batch redelivery (same micro-batch duplicate) is fenced too") {
    val Cap = 2
    val src = "dup.example"
    val b = Seq(CapRecord(7, src, 1), CapRecord(7, src, 1), CapRecord(8, src, 2),
      CapRecord(9, src, 3))
    val got = run(Seq(b), Cap, name = "cap_dup")
    assert(got.count(_.admitted) == 3, "7 admitted once + replay re-emit + 8")
    assert(got.count(v => v.admitted && !v.redelivered) == 2, "only 2 slots consumed")
    assert(got.filter(_.doc_id == 9).forall(!_.admitted), "9 rejected at cap")
    assert(got.count(_.redelivered) == 1)
  }
}
