package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Standing-query BM25 over a document stream — the alerting/routing
  * primitive: a fixed set of queries stands against the pipeline and
  * every arriving document is scored as it passes (route-to-topic,
  * saved-search alerts, streaming relevance gates).
  *
  * Entirely STATELESS, like [[StreamingBloomIngest]]: the corpus
  * statistics BM25 needs (N, avgdl, per-term df) are FROZEN from the
  * base corpus at query construction — the operational choice a live
  * index makes (stats drift slowly; re-freeze on the q127 cadence) —
  * and ride into the stream-side generated code as literals together
  * with the standing queries themselves. Scoring is one map-only
  * projection per micro-batch: per-document tf via in-row filter
  * counts, per-query rational-odds idf × tf saturation (the
  * q118/q125 formula, same determinism rules), summed per query in
  * rounded DECIMAL(18,9) fold order. No shuffle, no state store, no
  * watermark; append-mode and replay-deterministic.
  *
  * At 100 TB-rate streams the literal payload stays tiny — standing
  * queries are human-curated (100s), the df map is |union terms| —
  * while the corpus-sized work remains embarrassingly parallel.
  */
object StreamingBm25 {

  /** Score arriving docs against standing queries with frozen stats.
    *
    * @param docs    streaming (doc_id, text)
    * @param base    static base corpus (doc_id, text) — the stats source
    * @param queries standing queries (qid, terms); query-set-sized
    * @return streaming (doc_id, qid, score), one row per (arriving doc,
    *         standing query) with at least one matching term, score > 0
    */
  def standingQueryScores(docs: Dataset[(Long, String)], base: DataFrame,
      queries: Seq[(Long, Seq[String])],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val terms = queries.flatMap(_._2).distinct.sorted

    // one base pass freezes the stats: N, Σdl, df per standing term
    val toks = split(col("text"), " ")
    val dfCols = terms.map(t =>
      sum(when(array_contains(toks, t), 1L).otherwise(0L)).as(s"df_$t"))
    val aggCols = sum(size(toks).cast(LongType)).as("tot_dl") +: dfCols
    val statsRow = base.agg(count(lit(1)).as("n_docs"), aggCols: _*).collect()(0)
    val nDocs = statsRow.getLong(0)
    val totDl = statsRow.getLong(1)
    val dfMap = terms.zipWithIndex.map { case (t, i) => t -> statsRow.getLong(2 + i) }.toMap
    val avgdl = totDl.toDouble / math.max(nDocs, 1L).toDouble

    // frozen artifacts as literals riding into codegen
    val qlit = typedLit(queries.map { case (qid, ts) => (qid, ts.sorted) })
    val dflit = typedLit(dfMap)

    val tokens = split(col("text"), " ")
    val dl = size(tokens).cast(DoubleType)
    def contribution(t: Column): Column = {
      val tf = size(filter(tokens, x => x === t)).cast(DoubleType)
      val dfr = coalesce(element_at(dflit, t), lit(0L)).cast(DoubleType)
      val idf = (lit(nDocs.toDouble) - dfr + lit(0.5)) / (dfr + lit(0.5)) + lit(1.0)
      val sat = tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (dl / lit(avgdl))))
      when(tf > 0, round(idf * sat, 9)).otherwise(lit(0.0))
    }
    // per-query score: DECIMAL(18,9) fold in sorted-term order — the
    // q101/q125 determinism idiom, in-row
    val perQuery = transform(qlit, q => struct(
      q.getField("_1").as("qid"),
      aggregate(q.getField("_2"),
        lit(BigDecimal(0)).cast(DecimalType(18, 9)),
        // decimal + widens to (19,9); renarrow — scores are O(idf·terms),
        // far inside (18,9)
        (acc, t) => (acc + contribution(t).cast(DecimalType(18, 9)))
          .cast(DecimalType(18, 9)))
        .cast(DoubleType).as("score")))

    docs.toDF("doc_id", "text")
      .select(col("doc_id"), explode(perQuery).as("e"))
      .select(col("doc_id"), col("e.qid").as("qid"), col("e.score").as("score"))
      .where(col("score") > 0.0)
  }
}
