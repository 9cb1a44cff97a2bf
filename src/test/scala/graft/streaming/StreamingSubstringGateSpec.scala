package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamingSubstringGate.{DocArrival, SubstringHit}

/** The live exact-substring gate must converge, per document, to
  * exactly the batch q183 covered-token set (duplicated-L-gram window
  * unions), emit the first occurrence's correction exactly once, and
  * stay correct under replay. */
class StreamingSubstringGateSpec extends SparkSpecBase {
  import spark.implicits._

  /** q183's brute-force covered set: token positions under an L-gram
    * occurring ≥2 times across the whole corpus (same-doc included). */
  private def batchCovered(docs: Seq[DocArrival], L: Int): Map[Long, Set[Int]] = {
    val occ = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (d <- docs; t = d.text.split(" ", -1); i <- 0 to t.length - L)
      occ(t.slice(i, i + L).mkString(" ")) += 1
    docs.map { d =>
      val t = d.text.split(" ", -1)
      d.docId -> (for {
        i <- 0 to t.length - L
        if occ(t.slice(i, i + L).mkString(" ")) >= 2
        p <- i until i + L
      } yield p).toSet
    }.toMap
  }

  private def streamCovered(hits: Seq[SubstringHit], L: Int): Map[Long, Set[Int]] =
    hits.filterNot(_.redelivered).groupBy(_.docId).view.mapValues(
      _.flatMap(h => h.pos until h.pos + L).toSet).toMap

  private def runGate(chunks: Seq[Seq[DocArrival]], L: Int): Seq[SubstringHit] = {
    val name = s"substr_gate_${System.nanoTime()}"
    val input = MemoryStream[DocArrival](spark, 4)
    val q = StreamingSubstringGate.hits(input.toDS(), L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      spark.table(name).as[SubstringHit].collect().toSeq
    } finally q.stop()
  }

  test("per-doc flagged windows converge to the batch q183 covered set across batches") {
    val shared = (1 to 6).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      DocArrival(1L, "web", s"a1 a2 $shared a3", 1L),          // first occurrence: clean at arrival
      DocArrival(2L, "web", "b1 b2 b3 b4 b5 b6 b7 b8", 2L),    // clean forever
      DocArrival(3L, "news", s"c1 $shared c2 c3", 3L),         // triggers doc 1's correction
      DocArrival(4L, "web", s"$shared d1 d2", 4L),             // third copy: direct hit only
      DocArrival(5L, "web", s"e1 $shared e2 $shared", 5L)      // intra-doc repeat
    )
    val L = 6
    for (batches <- Seq(1, 2, 5)) {
      val chunks = docs.grouped(math.max(docs.size / batches, 1)).toSeq
      val hits = runGate(chunks, L)
      assert(streamCovered(hits, L) == batchCovered(docs, L).filter(_._2.nonEmpty),
        s"coverage mismatch at $batches batches")
      // the late-discovery protocol: doc 1 flagged only via correction
      val c1 = hits.filter(h => h.docId == 1L && !h.redelivered)
      assert(c1.nonEmpty && c1.forall(_.corrected),
        "first occurrence must be retro-flagged, not flagged at arrival")
      // each gram's first occurrence corrected exactly once
      val corr = hits.filter(h => h.corrected && !h.redelivered)
      assert(corr.map(h => (h.docId, h.pos)).distinct.size == corr.size,
        "duplicate correction rows")
      // later copies are flagged directly, never corrected
      assert(hits.filter(h => h.docId == 4L && !h.redelivered).forall(!_.corrected))
    }
  }

  test("intra-doc repeats duplicate against THEMSELVES (the paper's total-count rule)") {
    val span = (1 to 5).map(i => s"x$i").mkString(" ")
    val docs = Seq(DocArrival(9L, "web", s"$span y1 $span", 1L))
    val hits = runGate(Seq(docs), 5)
    assert(streamCovered(hits, 5) == batchCovered(docs, 5))
    assert(streamCovered(hits, 5)(9L).nonEmpty, "self-repeat must flag")
  }

  test("replay fence: redelivery re-emits current verdicts, never re-corrects or re-stores") {
    val shared = (1 to 6).map(i => s"s$i").mkString(" ")
    val b1 = Seq(DocArrival(1L, "web", s"a1 $shared a2", 1L))
    val b2 = Seq(DocArrival(2L, "web", s"b1 $shared b2", 2L))
    val b2replay = b2.map(identity) // same seq → redelivery
    val hits = runGate(Seq(b1, b2, b2replay), 6)
    val corrections = hits.filter(h => h.corrected && !h.redelivered)
    assert(corrections.size == 1 && corrections.head.docId == 1L,
      s"exactly one correction for the first occurrence, got $corrections")
    val redelivered = hits.filter(_.redelivered)
    assert(redelivered.nonEmpty && redelivered.forall(h => h.docId == 2L && !h.corrected),
      "replay re-emits the CURRENT verdict for the redelivered doc only")
    // coverage still converges (redeliveries excluded)
    assert(streamCovered(hits, 6) == batchCovered(b1 ++ b2, 6))
  }
}
