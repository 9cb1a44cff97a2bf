package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Standing-query BM25 over a document stream — the alerting/routing
  * primitive: a fixed set of queries stands against the pipeline and
  * every arriving document is scored as it passes (route-to-topic,
  * saved-search alerts, streaming relevance gates).
  *
  * Entirely STATELESS, like [[StreamingBloomIngest]]: the corpus
  * statistics BM25 needs (N, avgdl, per-term df) are FROZEN from the
  * base corpus at query construction — the operational choice a live
  * index makes (stats drift slowly; re-freeze on the q127 cadence).
  * The frozen artifact (standing queries + df map) is shipped as a
  * BROADCAST variable probed by a deterministic JVM kernel — NOT
  * inlined into the plan as `typedLit` literals: literals ride into
  * plan serialization and generated code, so plan size scales with
  * artifact size, and a web-scale standing set (say a million
  * monitored terms) blows task serialization. Broadcast ships the
  * artifact once per executor and keeps the plan O(1) in artifact
  * size; the kernel's per-row cost is one pass over the doc's tokens
  * (tf counting via hash map) plus per-(query,term) constant work.
  *
  * Scoring is one map-only projection per micro-batch: per-query
  * rational-odds idf × tf saturation (the q118/q125 formula), summed
  * per query in rounded DECIMAL(18,9) fold order — the kernel
  * reproduces the Catalyst chain digit-for-digit (Spark `split`
  * limit=-1, `round(double, 9)` via shortest-repr BigDecimal HALF_UP,
  * decimal(18,9) accumulation, decimal→double final cast). No
  * shuffle, no state store, no watermark; append-mode and
  * replay-deterministic.
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

    // frozen artifact: (qid, sorted terms) + df map, broadcast once
    val frozen = queries.map { case (qid, ts) => (qid, ts.sorted) }
    val bc = spark.sparkContext.broadcast((frozen, dfMap))

    val kernel = udf { (text: String) =>
      if (text == null) Seq.empty[(Long, Double)] // the Catalyst chain
      // scored null text to null and the score filter dropped the row;
      // the kernel must match (a null doc emits nothing, never NPEs)
      else {
      val (qs, dfm) = bc.value
      // tf in one pass; split(_, -1) = Spark's split (keeps trailing
      // empties, so dl matches size(split(text, ' ')) exactly)
      val tokens = text.split(" ", -1)
      val dl = tokens.length.toDouble
      val tf = new java.util.HashMap[String, Int]()
      tokens.foreach(t => tf.merge(t, 1, Integer.sum _))
      qs.flatMap { case (qid, ts) =>
        // DECIMAL(18,9) fold in sorted-term order: contribution is
        // round(idf·sat, 9) — Spark's Round(double) = shortest-repr
        // BigDecimal setScale(9, HALF_UP) — so the double→decimal cast
        // and every add are exact at scale 9; final decimal→double is
        // the same nearest-double Spark's Cast takes
        var acc = JBigDecimal.ZERO.setScale(9)
        ts.foreach { t =>
          val f = tf.getOrDefault(t, 0).toDouble
          if (f > 0) {
            val dfr = dfm.getOrElse(t, 0L).toDouble
            val idf = (nDocs.toDouble - dfr + 0.5) / (dfr + 0.5) + 1.0
            val sat = f * (k1 + 1.0) /
              (f + k1 * ((1.0 - b) + b * (dl / avgdl)))
            // Catalyst's Round returns a DOUBLE (the 9-place value's
            // nearest double) and the decimal cast re-reads THAT
            // double's shortest repr — the round-trip matters once the
            // 9-scaled value needs >15-16 significant digits (huge-N
            // idf), so the kernel replicates both hops
            val rounded = new JBigDecimal(java.lang.Double.toString(idf * sat))
              .setScale(9, RoundingMode.HALF_UP).doubleValue
            val c = new JBigDecimal(java.lang.Double.toString(rounded))
              .setScale(9, RoundingMode.HALF_UP)
            acc = acc.add(c)
          }
        }
        val score = acc.doubleValue
        if (score > 0.0) Some((qid, score)) else None
      }
      }
    }

    docs.toDF("doc_id", "text")
      .select(col("doc_id"), explode(kernel(col("text"))).as("e"))
      .select(col("doc_id"), col("e._1").as("qid"), col("e._2").as("score"))
  }
}
