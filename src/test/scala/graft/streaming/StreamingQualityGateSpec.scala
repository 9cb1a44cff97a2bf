package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import StreamingQualityGate.{DocRecord, QualityVerdict}

/** The live quality gate must agree with q170's batch verdicts per
  * document (same rule kernel), its running census must match a batch
  * recount, and the seq fence must make redelivery harmless. */
class StreamingQualityGateSpec extends SparkSpecBase {
  import spark.implicits._

  /** The q170 corpus: each document carrying its dirty-derived text. */
  private def dirtyCorpus(): Array[DocRecord] =
    graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"),
        graft.queries.Curation12.gopherDirty(col("text"), col("doc_id")).as("dirty"))
      .as[(Long, String, String)].collect().sortBy(_._1)
      .map { case (id, src, dirty) => DocRecord(id, src, dirty, id) }

  test("verdicts reproduce q170's batch keep flags and census across micro-batches") {
    val recs = dirtyCorpus()
    val chunks = recs.grouped(math.max(recs.length / 3, 1)).toSeq
    val input = MemoryStream[DocRecord](spark, 4)
    val q = StreamingQualityGate.verdicts(input.toDS())
      .writeStream.format("memory").queryName("quality_out")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      val got = spark.table("quality_out").as[QualityVerdict].collect()
      assert(got.length == recs.length)
      assert(!got.exists(_.redelivered), "clean delivery: nothing fenced")
      // per-doc equality with the batch q170 verdicts
      val want = graft.queries.Curation12.q170.run(spark, sfDir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(6))).toMap
      got.foreach { v =>
        val (nWords, keep) = want(v.docId)
        assert(v.nWords == nWords, s"doc ${v.docId} nWords")
        assert(v.keep == keep, s"doc ${v.docId} keep")
      }
      // running census: final counters per source == batch recount
      val finalBySource = got.groupBy(_.source)
        .map { case (s, vs) => s -> vs.maxBy(_.seq) }
      finalBySource.foreach { case (s, last) =>
        val docs = got.filter(_.source == s)
        assert(last.nSeen == docs.length.toLong, s"$s nSeen")
        assert(last.nKept == docs.count(_.keep).toLong, s"$s nKept")
      }
      // counters are monotone in seq order within a source
      got.groupBy(_.source).foreach { case (s, vs) =>
        val ordered = vs.sortBy(_.seq)
        assert(ordered.map(_.nSeen).toSeq == (1L to ordered.length).toSeq,
          s"$s nSeen not the running count")
        ordered.sliding(2).foreach {
          case Array(a, b) => assert(b.nKept - a.nKept == (if (b.keep) 1 else 0))
          case _ =>
        }
      }
      // the dirty derivation exercises the gate both ways
      assert(got.exists(_.keep) && got.exists(!_.keep))
    } finally q.stop()
  }

  test("redelivery fence: replays re-emit keep, never re-count the census") {
    val recs = dirtyCorpus().take(12)
    val fenced = spark.sparkContext.longAccumulator("quality_fenced")
    val input = MemoryStream[DocRecord](spark, 4)
    val q = StreamingQualityGate.verdicts(input.toDS(), Some(fenced))
      .writeStream.format("memory").queryName("quality_replay")
      .outputMode("append").start()
    try {
      input.addData(recs.toSeq); q.processAllAvailable()
      // full replay of batch 1 plus within-batch duplicate of one record
      input.addData(recs.toSeq :+ recs.head); q.processAllAvailable()
      val vs = spark.table("quality_replay").as[QualityVerdict].collect()
      assert(vs.length == recs.length * 2 + 1, "every delivery gets a verdict")
      assert(fenced.value == recs.length.toLong + 1, s"fence saw ${fenced.value}")
      // the census never double-counts: final counters equal batch-1's
      val bySource = recs.groupBy(_.source).map { case (s, rs) => s -> rs.length }
      vs.filter(_.redelivered).groupBy(_.source).foreach { case (s, rep) =>
        rep.foreach { v =>
          assert(v.nSeen <= bySource(s).toLong, s"$s re-counted on replay")
        }
      }
      // keep verdicts identical across original and replay
      vs.groupBy(_.docId).foreach { case (id, g) =>
        assert(g.map(_.keep).distinct.length == 1, s"doc $id verdict flipped")
      }
    } finally q.stop()
  }

  test("extended gate (includeRepetition) matches the batch q170∧q185∧q186 kernel") {
    val recs = dirtyCorpus()
    val input = MemoryStream[DocRecord](spark, 4)
    val q = StreamingQualityGate.verdicts(input.toDS(), None, includeRepetition = true)
      .writeStream.format("memory").queryName("quality_rep_out")
      .outputMode("append").start()
    try {
      input.addData(recs.toSeq); q.processAllAvailable()
      val got = spark.table("quality_rep_out").as[QualityVerdict].collect()
      assert(got.length == recs.length)
      // batch twin: the SAME combined kernel over the same records
      val base = graft.queries.Curation12
        .withGopherSignals(spark.createDataset(recs.toSeq).toDF(), col("text"))
      val combined = graft.queries.Curation16
        .withRepetitionSignals(base, col("text"), col("docId"))
        .select(col("docId"), col("keep"), col("rep_keep")).collect()
      val gopherKeep = combined.map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val wantKeep = combined
        .map(r => r.getLong(0) -> (r.getBoolean(1) && r.getBoolean(2))).toMap
      got.foreach(v => assert(v.keep == wantKeep(v.docId), s"doc ${v.docId} keep"))
      // the repetition rules must add real signal: at least one doc the
      // q170 rules keep is rejected by the duplication rules
      assert(got.exists(v => !v.keep && gopherKeep(v.docId)),
        "repetition rules never fired beyond q170")
      assert(got.exists(_.keep), "extended gate rejects everything")
    } finally q.stop()
  }
}
