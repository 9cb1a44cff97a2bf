package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import StreamingSplitRouter.{DocArrival, SplitVerdict}

/** The live split router must converge, per document, to exactly the
  * batch q181 assignment (hash split + cluster-coherent quarantine),
  * emit corrections only into train, and stay correct under replay. */
class StreamingSplitRouterSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splitOf(id: Long, src: String): String = {
    val h = md5hex(s"$id:$src").substring(0, 2)
    if (h < "0d") "val" else if (h < "1a") "test" else "train"
  }

  /** The q174/q181 derived corpus: adopters carry their leader's text. */
  private def derivedCorpus(): Array[DocArrival] = {
    val docs = graft.Tables(spark, sfDir).documents
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val textById = docs.map(d => d._1 -> d._3).toMap
    docs.map { case (id, src, text) =>
      val content =
        if (Seq(0L, 7L, 13L).contains(id % 25))
          textById.getOrElse(id - id % 25, text)
        else text
      DocArrival(id, src, content, id)
    }.sortBy(_.seq)
  }

  private def finalAssignment(vs: Seq[SplitVerdict]): Map[Long, String] =
    vs.filterNot(_.redelivered).groupBy(_.docId).map { case (id, g) =>
      id -> g.maxBy(v => (v.seq, v.corrected)).split
    }

  test("final assignments converge to the batch q181 repair across micro-batches") {
    val recs = derivedCorpus()
    val chunks = recs.grouped(math.max(recs.length / 4, 1)).toSeq
    val input = MemoryStream[DocArrival](spark, 4)
    val q = StreamingSplitRouter.verdicts(input.toDS())
      .writeStream.format("memory").queryName("router_out")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      val vs = spark.table("router_out").as[SplitVerdict].collect().toSeq
      // driver replay of the q181 rule
      val byContent = recs.groupBy(_.text)
      val straddles = byContent.map { case (c, g) =>
        c -> (g.map(r => splitOf(r.docId, r.source)).distinct.length > 1) }
      val expect = recs.map { r =>
        val own = splitOf(r.docId, r.source)
        r.docId -> (if (straddles(r.text)) "train" else own)
      }.toMap
      val got = finalAssignment(vs)
      assert(got.keySet == expect.keySet)
      got.foreach { case (id, s0) => assert(s0 == expect(id), s"doc $id") }
      // corrections only ever point INTO train, for docs first routed off-train
      val corrections = vs.filter(_.corrected)
      assert(corrections.nonEmpty, "derived clusters produced no corrections")
      assert(corrections.forall(_.split == "train"))
      corrections.foreach { c =>
        val orig = vs.find(v => v.docId == c.docId && !v.corrected && !v.redelivered).get
        assert(orig.split != "train", s"doc ${c.docId} corrected from train")
        assert(c.seq > orig.seq, s"doc ${c.docId} correction not after original")
      }
      // transition census equals the batch q181 census
      val trans = recs.map { r =>
        (splitOf(r.docId, r.source), expect(r.docId))
      }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
      val batch = graft.queries.Curation14.q181.run(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(trans == batch, "streamed transitions must equal the q181 census")
      // at most one correction per doc, and corrections cover EXACTLY
      // the moved docs that were misrouted before their cluster's
      // quarantine (later arrivals route straight to train, no
      // correction needed — so corrections ⊆ moved, never more)
      assert(corrections.map(_.docId).distinct.length == corrections.length)
      val moved = expect.collect {
        case (id, "train") if {
          val r = recs.find(_.docId == id).get
          splitOf(r.docId, r.source) != "train"
        } => id
      }.toSet
      assert(corrections.map(_.docId).toSet.subsetOf(moved))
      assert(corrections.length.toLong <=
        batch.collect { case ((f, t), n) if f != t => n }.sum)
    } finally q.stop()
  }

  test("replay fence: redelivery re-emits the CURRENT assignment, never re-corrects") {
    // one cluster straddling val/train plus a clean doc, in two batches
    val recs = derivedCorpus()
    val byContent = recs.groupBy(_.text)
    val cluster = byContent.values
      .find(g => g.map(r => splitOf(r.docId, r.source)).distinct.length > 1)
      .get.sortBy(_.seq)
    val offTrain = cluster.find(r => splitOf(r.docId, r.source) != "train").get
    // seq is the DELIVERY sequence (the operator contract), so it is
    // assigned here in delivery order — not the doc_id
    val b1 = Seq(offTrain.copy(seq = 1L))
    val b2 = cluster.filterNot(_.docId == offTrain.docId).toSeq
      .zipWithIndex.map { case (r, i) => r.copy(seq = 2L + i) } // triggers quarantine
    val b3 = Seq(offTrain.copy(seq = 1L)) // replay AFTER the quarantine is in state
    val input = MemoryStream[DocArrival](spark, 4)
    val q = StreamingSplitRouter.verdicts(input.toDS())
      .writeStream.format("memory").queryName("router_replay")
      .outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b3); q.processAllAvailable()
      val vs = spark.table("router_replay").as[SplitVerdict].collect().toSeq
      // the replayed doc's redelivered verdict carries its POST-quarantine split
      val replayed = vs.filter(v => v.docId == offTrain.docId && v.redelivered)
      assert(replayed.length == 1)
      assert(replayed.head.split == "train", "redelivery must reflect the quarantine")
      // exactly ONE correction for it, from the quarantine event
      assert(vs.count(v => v.docId == offTrain.docId && v.corrected) == 1)
      // every cluster member's final assignment is train
      val finals = finalAssignment(vs)
      cluster.foreach { r => assert(finals(r.docId) == "train", s"doc ${r.docId}") }
    } finally q.stop()
  }
}
