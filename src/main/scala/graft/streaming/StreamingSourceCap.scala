package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live per-source admission gate — the streaming companion of q163's
  * domain cap: a firehose ingest must bound what any single source can
  * contribute BEFORE paying downstream cost (decode, quality gates,
  * dedup state), so the gate runs on arrival with per-source counters
  * in keyed state.
  *
  * Semantics are deliberately DIFFERENT from q163 and documented as
  * such: an online gate cannot know the corpus-wide hash priority, so
  * it admits the FIRST `cap` arrivals per source (deterministic within
  * a micro-batch by doc_id order) — the operational pair is this live
  * bound for ingest-cost control plus the nightly q163 run that
  * re-caps the stored corpus exactly and reproducibly. Every document
  * gets a verdict row (admitted or not), so the reject stream is
  * routable to a dead-letter/audit sink like any other gate's.
  *
  * Scale: state is ONE counter per source (a long), the shuffle is the
  * same source-keyed exchange the batch cap uses, verdicts are
  * append-mode. Counters never expire by design — a cap is a corpus
  * property, not a window property; use q156-style erasure if a source
  * must reset.
  */
object StreamingSourceCap {

  final case class Verdict(doc_id: Long, source: String, admitted: Boolean,
      n_admitted: Long)

  /** @param docs streaming (doc_id, source)
    * @param cap   max admitted documents per source */
  def admissions(docs: Dataset[(Long, String)], cap: Int): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (src: String, it: Iterator[(Long, String)], st: GroupState[Long]) =>
          var n = st.getOption.getOrElse(0L)
          // doc_id order makes the within-batch admission deterministic
          // under Spark's unordered group iterator
          val out = it.map(_._1).toArray.sorted.map { id =>
            val admit = n < cap
            if (admit) n += 1
            Verdict(id, src, admit, n)
          }
          st.update(n)
          out.iterator
      }
  }
}
