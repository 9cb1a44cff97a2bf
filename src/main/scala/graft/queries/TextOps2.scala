package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Second text/vector batch for the training-data pipeline surface:
  * repetition scoring (Gopher-style top-n-gram fraction), rarest-term
  * extraction (the tf-idf join shape with a fully deterministic integer
  * metric), and vector norms via higher-order functions.
  *
  * Scale notes: repetition and rare-terms are explode → two-level
  * groupBy pipelines (all partial-aggregated); the document-frequency
  * table is vocabulary-sized — small relative to the corpus — so its
  * join back to per-doc terms broadcasts. No O(n²) stage anywhere.
  */
object TextOps2 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  /** Longest equal-run in a sorted string array (per-row fold; equals
    * the max multiplicity of the underlying multiset). */
  def longestRun(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  // -- q72: repetition ratio (most-frequent bigram share per doc) -------
  // The Gopher/MassiveText "repetition" quality signal: fraction of all
  // (non-distinct) 2-grams taken by the single most frequent one.
  // Single-token docs have no bigrams and drop out in both engines.
  val q72 = q("q72_repetition",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b FROM d),
      |c AS (SELECT doc_id, b, COUNT(*) AS n FROM bg GROUP BY 1, 2)
      |SELECT doc_id,
      |  max(n) AS top_n,
      |  CAST(SUM(n) AS BIGINT) AS n_bigrams,
      |  CAST(max(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS rep_ratio
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // The bigram multiset never leaves its row: sort the bigrams and
    // take the longest equal-run with a single aggregate() fold. Zero
    // shuffles (vs. explode → groupBy(doc,bigram) → groupBy(doc), which
    // shuffles ~tokens×docs rows twice) — at corpus scale this is the
    // difference between a map-only stage and two wide exchanges.
    val t = split(col("text"), " ")
    val sortedBg = array_sort(graft.functions.expr.TextExpressions.spanJoin(t, 2))
    val topRun = longestRun(sortedBg)
    Tables(s, dir).documents
      .where(size(t) >= 2)
      .select(
        col("doc_id"),
        topRun.as("top_n"),
        (size(t) - 1).cast("long").as("n_bigrams"),
        (topRun.cast("double") / (size(t) - 1).cast("double")).as("rep_ratio"))
      .orderBy("doc_id")
  }

  // -- q73: rarest term per document (tf-idf join shape) ----------------
  // Corpus document frequency joined back to per-doc distinct terms;
  // rank by (df asc, term asc) — an integer/string total order, so the
  // winner is engine-independent (no float idf in the ranking).
  val q73 = q("q73_rare_terms",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |w AS (SELECT doc_id, unnest(list_distinct(t)) AS word FROM d),
      |df AS (SELECT word, COUNT(*) AS df FROM w GROUP BY 1),
      |r AS (SELECT doc_id, word, df,
      |        row_number() OVER (PARTITION BY doc_id ORDER BY df, word) AS rk
      |      FROM w JOIN df USING (word))
      |SELECT doc_id, word AS rare_word, df AS rare_df FROM r WHERE rk = 1
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val words = Tables(s, dir).documents
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("word"))
    val df = words.groupBy("word").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("word"))
    words.join(broadcast(df), Seq("word"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("word").as("rare_word"), col("df").as("rare_df"))
      .orderBy("doc_id")
  }

  // -- q75: vector norms via higher-order fold (no UDF) -----------------
  // aggregate() folds in ascending index order — the same order DuckDB's
  // list_dot_product accumulates — so the double sum is bit-identical;
  // sqrt is correctly rounded IEEE in both.
  val q75 = q("q75_vector_norms",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT vec_id,
      |  CAST(len(v) AS INTEGER) AS dim,
      |  round(sqrt(list_dot_product(v, v)), 4) AS l2
      |FROM e ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val v = col("embedding").cast(ArrayType(DoubleType))
    Tables(s, dir).embeddings.select(
      col("vec_id"),
      size(v).as("dim"),
      round(sqrt(graft.functions.expr.SimilarityExpressions.dotProduct(v, v)), 4).as("l2"))
      .orderBy("vec_id")
  }

  // -- q98: int8 embedding quantization + reconstruction error ----------
  // Symmetric scalar quantization (the storage-compression step before
  // shipping vectors at corpus scale): scale by max-abs to [-127, 127],
  // floor(x + 0.5) so rounding is engine-identical (no round-half-even
  // ambiguity), and report the L2 reconstruction error. Map-only; both
  // engines fold element sums in ascending index order.
  val q98 = q("q98_embed_quantize",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
      |qz AS (SELECT vec_id, v, mx,
      |         list_transform(v, x -> floor(x / mx * 127 + 0.5)) AS q
      |       FROM m WHERE mx > 0)
      |SELECT vec_id,
      |  round(mx, 6) AS max_abs,
      |  CAST(list_max(q) AS BIGINT) AS q_max,
      |  CAST(list_min(q) AS BIGINT) AS q_min,
      |  round(sqrt(list_sum(list_transform(range(1, len(v) + 1),
      |        i -> (v[i] - (q[i] * mx) / 127) * (v[i] - (q[i] * mx) / 127)))), 6) AS l2_err
      |FROM qz ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val v = col("embedding").cast(org.apache.spark.sql.types.ArrayType(DoubleType))
    val mx = array_max(transform(v, x => abs(x)))
    Tables(s, dir).embeddings
      .select(col("vec_id"), v.as("v"), mx.as("mx"))
      .where(col("mx") > 0)
      .select(col("vec_id"), col("v"), col("mx"),
        transform(col("v"), x => floor(x / col("mx") * 127 + 0.5)).as("q"))
      .select(
        col("vec_id"),
        round(col("mx"), 6).as("max_abs"),
        array_max(col("q")).cast("long").as("q_max"),
        array_min(col("q")).cast("long").as("q_min"),
        round(sqrt(aggregate(
          zip_with(col("v"), col("q"), (x, qi) => (x - (qi * col("mx")) / 127) * (x - (qi * col("mx")) / 127)),
          lit(0.0), (acc, e) => acc + e)), 6).as("l2_err"))
      .orderBy("vec_id")
  }

  // -- q133: tf-idf top-k keyword extraction per document ---------------
  // The document-tagging stage (topic routing, dedup blocking keys,
  // retrieval-index metadata): per doc, the k terms with the highest
  // tf·idf. The idf is the q118 rational surrogate — score =
  // tf·(N−df)/df, monotone decreasing in df with no transcendental, so
  // the double score is ONE IEEE division of exact integers and both
  // engines rank identically (ties → word byte order).
  //
  // Shape: tf is a (doc,word)-keyed aggregate (partial map-side — the
  // corpus token stream collapses before the exchange); df is
  // vocabulary-sized via in-row array_distinct (no dedup shuffle) and
  // BROADCASTS back, as does the 1-row corpus count; the head is a
  // row_number window partitioned by doc_id — millions of partitions at
  // corpus scale, never a global sort.
  val q133 = q("q133_tfidf_keywords",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |w AS (SELECT doc_id, unnest(t) AS word FROM d),
      |tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM w GROUP BY doc_id, word),
      |df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df
      |       FROM (SELECT doc_id, unnest(list_distinct(t)) AS word FROM d)
      |       GROUP BY word),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |s AS (SELECT doc_id, word, tf, df,
      |        CAST(tf * ((SELECT n FROM n) - df) AS DOUBLE) / df AS score
      |      FROM tf JOIN df USING (word)),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |                                   ORDER BY score DESC, word) AS rank FROM s)
      |SELECT doc_id, CAST(rank AS INTEGER) AS rank, word, tf, df, score
      |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = docs
      .select(explode(array_distinct(split(col("text"), " "))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("word"))
    tf.join(broadcast(df), Seq("word"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * (col("n") - col("df"))).cast(DoubleType) / col("df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("word"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  val all: Seq[GraftQuery] = Seq(q72, q73, q75, q98, q133)
}
