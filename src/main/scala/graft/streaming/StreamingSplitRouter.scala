package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live train/val/test split router — the streaming twin of q172's
  * deterministic hash split WITH q181's cluster-coherent quarantine:
  * documents arrive as a stream, each gets its md5-bucket split
  * assignment MAP-SIDE (the exact q172 rule,
  * [[graft.queries.Curation13.splitCol]]), and keyed state over the
  * content fingerprint enforces leak-freeness on the fly — the moment
  * a cluster is seen straddling two splits, the whole cluster
  * quarantines into train: the arriving document routes to train, and
  * every PRIOR member that was routed to val/test gets a CORRECTION
  * row (`corrected = true`, split `train`) so a downstream sink can
  * reassign it. The last verdict per document therefore converges to
  * exactly the batch q181 assignment (StreamingSplitRouterSpec pins
  * per-doc convergence and the transition census).
  *
  * At-least-once: `seq` is the stream's monotone delivery sequence
  * (repeated only on redelivery). The per-fingerprint high-water fence
  * re-emits a redelivered document's CURRENT assignment (train if its
  * cluster quarantined since) without mutating state — replay can
  * neither double-quarantine nor re-append to the pending list.
  * Within one micro-batch records process in seq order, so a replay
  * that lands in the SAME batch as (but with a lower seq than) the
  * straddle-triggering arrival re-emits the pre-quarantine assignment;
  * the correction row for the document still follows in that batch's
  * output, so convergence is unaffected.
  *
  * Scale: split assignment and fingerprinting are map-side; the one
  * shuffle keys on the content fingerprint — the same key the batch
  * audit groups on. State per fingerprint is the first-seen split,
  * the quarantine flag, the seq fence, and the pending list of
  * non-train members awaiting possible correction. Pending is the only
  * unbounded-ish piece: it holds val/test members of a NOT-yet-
  * straddling cluster (~5–10% of a cluster under the 13/13/230 split),
  * and `maxPending` fails loudly past the bound (the
  * [[LiveClusterIndex]] discipline) — a cluster that large is a dedup
  * problem (q27/q84), not a routing problem. Verdicts are append-mode;
  * corrections are new rows, never retractions of committed output.
  */
object StreamingSplitRouter {

  /** One arriving document; `seq` is the stream's monotone delivery
    * sequence (repeated only on redelivery — see class doc). */
  final case class DocArrival(docId: Long, source: String, text: String, seq: Long)

  /** `corrected = false`: the routing verdict at arrival.
    * `corrected = true`: a reassignment of an EARLIER document whose
    * cluster quarantined (always to train). */
  final case class SplitVerdict(docId: Long, source: String, split: String,
      corrected: Boolean, redelivered: Boolean, seq: Long)

  // public: GroupState encoders need constructor access.
  // pendingCount mirrors pendingIds.length so the maxPending bound
  // check stays O(1) per arrival (List.size is O(n) — a large
  // never-straddling cluster would otherwise pay O(n²) per batch).
  //
  // STATE-ENCODING VERSION NOTE: adding pendingCount changed the
  // flatMapGroupsWithState state schema. A checkpoint written by the
  // pre-pendingCount encoding (5-field struct) will FAIL state
  // deserialization on resume — Spark cannot widen a stored struct to
  // a new case-class shape. Deployments upgrading across that change
  // must restart from a fresh checkpoint (replaying the source; the
  // seq fence makes the replay idempotent on the output side). Any
  // future field added here carries the same cost — prefer deriving
  // new values from existing fields over growing the struct.
  final case class RouteState(firstSplit: String, quarantined: Boolean,
      highSeq: Long, pendingIds: List[Long], pendingSources: List[String],
      pendingCount: Int)

  // public: Dataset encoders generate accessor code for this class
  final case class KeyedArrival(docId: Long, source: String, seq: Long,
      fp: String, split: String)

  /** @param maxPending loud bound on val/test members retained per
    *   fingerprint awaiting possible correction (see class doc). */
  def verdicts(records: Dataset[DocArrival], maxPending: Int = 10000)
      : Dataset[SplitVerdict] = {
    val spark = records.sparkSession
    import spark.implicits._
    val keyed = records.toDF()
      .withColumn("fp", md5(col("text")))
      .withColumn("split",
        graft.queries.Curation13.splitCol(col("docId"), col("source")))
      .select(col("docId"), col("source"), col("seq"), col("fp"), col("split"))
      .as[KeyedArrival]
    keyed.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[KeyedArrival], st: GroupState[RouteState]) =>
          val st0 = st.getOption.getOrElse(
            RouteState("", quarantined = false, Long.MinValue, Nil, Nil, 0))
          var first = st0.firstSplit
          var quarantined = st0.quarantined
          var high = st0.highSeq
          var pendingIds = st0.pendingIds
          var pendingSources = st0.pendingSources
          var pendingCount = st0.pendingCount
          val out = scala.collection.mutable.ArrayBuffer.empty[SplitVerdict]
          // seq order = delivery order: deterministic under Spark's
          // unordered group iterator
          it.toArray.sortBy(_.seq).foreach { r =>
            if (r.seq <= high) { // redelivery: CURRENT assignment, no state change
              val cur = if (quarantined) "train" else r.split
              out += SplitVerdict(r.docId, r.source, cur,
                corrected = false, redelivered = true, r.seq)
            } else {
              high = r.seq
              if (first.isEmpty) first = r.split
              if (!quarantined && r.split != first) {
                // straddle discovered: quarantine the whole cluster
                quarantined = true
                pendingIds.zip(pendingSources).foreach { case (id, src) =>
                  out += SplitVerdict(id, src, "train",
                    corrected = true, redelivered = false, r.seq)
                }
                pendingIds = Nil; pendingSources = Nil; pendingCount = 0
              }
              val assigned = if (quarantined) "train" else r.split
              if (!quarantined && assigned != "train") {
                if (pendingCount >= maxPending)
                  throw new IllegalStateException(
                    s"StreamingSplitRouter pending bound exceeded: fingerprint " +
                    s"cluster holds > $maxPending uncorrected val/test members — " +
                    "a cluster this large is a dedup problem (route it through " +
                    "q27/q84 first) or raise maxPending if memory allows.")
                pendingIds ::= r.docId; pendingSources ::= r.source
                pendingCount += 1
              }
              out += SplitVerdict(r.docId, r.source, assigned,
                corrected = false, redelivered = false, r.seq)
            }
          }
          st.update(RouteState(first, quarantined, high, pendingIds, pendingSources,
            pendingCount))
          out.iterator
      }
  }
}
