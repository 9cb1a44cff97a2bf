package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) — the
  * standard way to combine heterogeneous retrieval runs (lexical BM25,
  * dense ANN, ...) without score calibration: each run contributes
  * 1/(k0 + rank) per document, ranks being all that cross the run
  * boundary.
  *
  * Scale shape: runs arrive as (qid, id, rk) relations that are
  * ALREADY top-k'd per query (each run's head is the bounded-heap
  * partial top-k upstream), so fusion operates on (queries × k × runs)
  * rows — never corpus-sized. One union, one map-side-combined
  * aggregate on (qid, id), and a bounded-heap head for the fused
  * ranking.
  *
  * Determinism: each contribution is an int/int IEEE division rounded
  * to 9 decimals and summed in exact DECIMAL(18,9) (the q101/q125
  * idiom), so the variable-per-doc sum (a doc may appear in any subset
  * of runs) is accumulation-order-free and bit-identical in DuckDB;
  * fused-score ties break on id.
  */
object Rrf {

  /** Fuse ranked runs.
    *
    * @param runs  (qid, id, rk) relations; rk is 1-based rank within
    *              the run. A doc absent from a run simply contributes
    *              nothing for it (standard RRF).
    * @param k0    rank damping constant (60 in the original paper).
    * @param topK  fused results per query.
    * @return (qid, id, rk, score) in (qid, rk) order.
    */
  def fuse(runs: Seq[DataFrame], k0: Int = 60, topK: Int = 10): DataFrame = {
    require(runs.nonEmpty, "rrf needs at least one run")
    val contribs = runs.map(_.select(col("qid"), col("id"),
        round(lit(1.0) / (lit(k0.toDouble) + col("rk").cast(DoubleType)), 9)
          .cast(DecimalType(18, 9)).as("w")))
      .reduce(_ unionAll _)
    contribs.groupBy("qid", "id")
      .agg(sum(col("w")).cast(DoubleType).as("score"))
      .groupBy("qid")
      .agg(graft.functions.TopK.topKDouble(topK)(col("id"), col("score")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("qid"), col("e._1").as("id"),
        (col("pos") + 1).as("rk"), col("e._2").as("score"))
      .orderBy("qid", "rk")
  }
}
