package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming twin of q131's seed-set vote classifier — the quality gate
  * a live ingest pipeline runs on every arriving document (the batch
  * query scores the corpus; this scores the firehose).
  *
  * Stateless, like [[StreamingBm25]]: the trained artifact (the
  * per-token vote table — sign of the NB log-odds between two seed
  * slices, [[graft.queries.Curation6.voteTable]]) is FROZEN at stream
  * construction and rides into the generated code as a map literal.
  * Scoring is a map-only projection per micro-batch: per-doc distinct
  * tokens in-row (array_distinct — no token-grain state), vote lookups
  * against the literal, integer sums. No shuffle, no state store;
  * append-mode and replay-deterministic, so the stream's verdicts equal
  * the batch query's rows for the same documents exactly.
  *
  * At firehose rates the frozen artifact stays seed-vocabulary-sized
  * (the seeds are curated sets, not the corpus); re-freeze on the same
  * cadence as the other standing artifacts (the q127 pattern).
  */
object StreamingVoteClassifier {

  /** Label arriving docs with the frozen vote table.
    *
    * @param docs  streaming (doc_id, text)
    * @param votes trained vote table (word, vote ∈ {−1,0,1}) — a batch
    *              relation; collected once here (vocab-sized)
    * @return streaming (doc_id, pos_votes, neg_votes, margin, label),
    *         one row per doc with ≥1 seed-known token (q131 semantics)
    */
  def labeled(docs: Dataset[(Long, String)], votes: DataFrame): DataFrame = {
    val voteMap: Map[String, Long] = votes.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val vlit = typedLit(voteMap)
    val toks = array_distinct(split(col("text"), " "))
    val known = filter(toks, t => element_at(vlit, t).isNotNull)
    def countVotes(v: Long) =
      size(filter(known, t => element_at(vlit, t) === v)).cast("long")
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        countVotes(1L).as("pos_votes"),
        countVotes(-1L).as("neg_votes"),
        aggregate(known, lit(0L), (acc, t) => acc + element_at(vlit, t)).as("margin"),
        size(known).as("n_known"))
      .where(col("n_known") > 0)
      .withColumn("label", when(col("margin") > 0, "keep").otherwise("drop"))
      .drop("n_known")
  }
}
