package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live document quality gate — the streaming twin of q170: documents
  * arrive as a stream, each is scored MAP-SIDE with the exact Gopher
  * §A1.1 rule kernel ([[graft.queries.Curation12.withGopherSignals]])
  * before any shuffle, and keyed state per source maintains the running
  * admission census (`nSeen`/`nKept`) so an ops dashboard can alert the
  * moment a source's keep-rate collapses (a crawler pulling in a spam
  * host shows up here batches before a batch census would run). The
  * batch q170 verdicts and this gate agree by construction — the rule
  * runs as the same Column kernel (StreamingQualityGateSpec pins the
  * per-doc equality and the census match).
  *
  * At-least-once: `seq` is the stream's monotone delivery sequence
  * (repeated only on redelivery). The rule itself is stateless and
  * deterministic, so a redelivered document naturally re-emits its
  * original `keep`; the per-source high-water fence exists for the
  * CENSUS — a replay at or below the fence never re-counts into
  * `nSeen`/`nKept` (the [[StreamingSourceCap]] discipline). Redelivered
  * verdicts carry the CURRENT counters, not the values at original
  * delivery.
  *
  * Scale: scoring is per-row codegen'd higher-order functions on the
  * map side; the only shuffle is one exchange keyed by source, and
  * state per source is three longs — |sources| entries total, no
  * per-document state, so an unbounded corpus needs no retention
  * policy. Verdicts are append-mode.
  */
object StreamingQualityGate {

  /** One arriving document; `seq` is the stream's monotone delivery
    * sequence (repeated only on redelivery — see class doc). */
  final case class DocRecord(docId: Long, source: String, text: String, seq: Long)

  final case class QualityVerdict(docId: Long, source: String, keep: Boolean,
      nWords: Long, nSeen: Long, nKept: Long, redelivered: Boolean, seq: Long)

  // public: GroupState encoders need constructor access
  final case class GateState(nSeen: Long, nKept: Long, highSeq: Long)

  // public: Dataset encoders generate accessor code for this class
  final case class ScoredRecord(docId: Long, source: String, seq: Long,
      keep: Boolean, nWords: Long)

  /** @param fenced optional counter for redeliveries caught by the seq
    *   fence — zero under clean delivery (rate gauge only, never
    *   correctness: accumulators over-count under task retry).
    * @param includeRepetition when true, the verdict additionally ANDs
    *   in the Gopher REPETITION rules (duplicate-line/paragraph
    *   fractions + top-2/3/4-gram character shares — the q185/q186
    *   kernels from [[graft.queries.Curation16.withRepetitionSignals]]),
    *   still scored map-side before the source exchange. Default false
    *   keeps the historical q170-only verdict (and checkpoint-compatible
    *   output) for existing deployments. */
  def verdicts(records: Dataset[DocRecord],
      fenced: Option[org.apache.spark.util.LongAccumulator] = None,
      includeRepetition: Boolean = false)
      : Dataset[QualityVerdict] = {
    val spark = records.sparkSession
    import spark.implicits._
    val gopher = graft.queries.Curation12
      .withGopherSignals(records.toDF(), col("text"))
    val ruled =
      if (includeRepetition)
        graft.queries.Curation16
          .withRepetitionSignals(gopher, col("text"), col("docId"))
          .withColumn("keep", col("keep") && col("rep_keep"))
      else gopher
    val scored = ruled
      .select(col("docId"), col("source"), col("seq"), col("keep"), col("n_words"))
      .withColumnRenamed("n_words", "nWords")
      .as[ScoredRecord]
    scored.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (source: String, it: Iterator[ScoredRecord], st: GroupState[GateState]) =>
          val st0 = st.getOption.getOrElse(GateState(0L, 0L, Long.MinValue))
          var seen = st0.nSeen
          var kept = st0.nKept
          var high = st0.highSeq
          // seq order = delivery order: deterministic under Spark's
          // unordered group iterator
          val out = it.toArray.sortBy(_.seq).map { r =>
            if (r.seq <= high) { // redelivery: census untouched
              fenced.foreach(_.add(1L))
              QualityVerdict(r.docId, source, r.keep, r.nWords,
                seen, kept, redelivered = true, r.seq)
            } else {
              high = r.seq
              seen += 1
              if (r.keep) kept += 1
              QualityVerdict(r.docId, source, r.keep, r.nWords,
                seen, kept, redelivered = false, r.seq)
            }
          }
          st.update(GateState(seen, kept, high))
          out.iterator
      }
  }
}
