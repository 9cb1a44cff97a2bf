package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl.sumDec
import graft.functions.expr.SimilarityExpressions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation suite — the operations a large-scale training-data
  * pipeline runs between raw crawl and tokenizer: reproducible
  * stratified sampling, cross-document span dedup (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better"),
  * lexical-diversity stats, Zipf head inspection, a C4/Gopher-style
  * quality gate, containment scoring for asymmetric near-dups, and
  * clustering of near-dup pairs into keep-one groups.
  *
  * Scale notes are per query; the common theme: per-document signals
  * are computed inside the row (map-only), corpus-level structures
  * (vocabulary, span index, components) shuffle only aggregated or
  * candidate-sized data.
  */
object Curation {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  private def toks: Column = split(col("text"), " ")

  /** documents with the token array materialized once per row (`_t`).
    * Inlining `toks` inside a per-element lambda (`transform`/`slice`/
    * `element_at`) re-splits the whole text on EVERY element access —
    * O(len²) character work and allocation per doc (measured 8× on the
    * bigram explode at sf0.1). A projection boundary holds because the
    * alias is referenced more than once, so CollapseProject keeps it. */
  private def tokenized(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents.withColumn("_t", toks)

  // -- q77: deterministic stratified sample -----------------------------
  // Reproducible per-stratum systematic sampling: a cross-engine hash
  // draw on the key against a per-language per-mille rate. Unlike
  // rand()-based sampleBy, re-runs (and both engines) select the SAME
  // rows — at 100 TB reproducibility is what makes the sample auditable.
  // The draw is QueryDsl.crossHash60, not an integer multiply: a
  // `doc_id * bigPrime` mix silently wraps negative in Spark past
  // doc_id ≈ 3.5e9 while DuckDB errors — exactly the scale where
  // reproducibility matters. Map-only: no shuffle at all.
  val q77 = q("q77_stratified_sample_hash",
    s"""SELECT doc_id, lang FROM documents
      |WHERE ${graft.QueryDsl.crossHash60Sql("doc_id")} % 1000 <
      |      CASE WHEN lang = 'en' THEN 100 ELSE 200 END
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.QueryDsl.crossHash60
    val rate = when(col("lang") === "en", 100).otherwise(200)
    Tables(s, dir).documents
      .where(pmod(crossHash60(col("doc_id")), lit(1000)) < rate)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  // -- q78: cross-document span dedup (8-token exact spans) -------------
  // The exact-substring dedup signal: every 8-token window, grouped
  // corpus-wide; spans seen in ≥2 distinct docs are the removable
  // boilerplate. At scale the groupBy key is the span hash (group on
  // (xxhash64(span), span) — same shuffle width as hashing alone since
  // the span string must survive for the report); partial aggregation
  // collapses within-doc repeats map-side.
  val q78 = q("q78_span_dedup",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sp AS (SELECT doc_id,
      |         unnest(list_transform(range(1, len(t) - 6),
      |                i -> list_aggregate(t[i:i+7], 'string_agg', ' '))) AS span
      |       FROM d WHERE len(t) >= 8)
      |SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  min(doc_id) AS first_doc
      |FROM sp GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
      |ORDER BY span""".stripMargin) { (s, dir) =>
    val t = col("_t")
    // codegen-native sliding 8-token spans (see TextKernels.spanJoin):
    // exact twin of the transform(sequence, array_join(slice)) HOF
    val spans = graft.functions.expr.TextExpressions.spanJoin(t, 8)
    // Two-level aggregate instead of COUNT(DISTINCT …) + MIN in one
    // groupBy: count-distinct alongside another aggregate plans an
    // Expand (2 rows per input) before the shuffle; deduping (span,
    // doc_id) first collapses within-doc repeats map-side and the
    // second level is a plain count — same two exchanges, no row
    // doubling.
    tokenized(s, dir)
      .where(size(t) >= 8)
      .select(col("doc_id"), explode(spans).as("span"))
      .groupBy("span", "doc_id").agg(lit(1))
      .groupBy("span")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= 2)
      .orderBy("span")
  }

  // -- q79: lexical diversity — type/token ratio + hapax count ----------
  // Entirely per-row: sort the tokens once, then count run boundaries
  // (types) and runs of length 1 (hapax legomena) by index probing the
  // sorted array. Zero shuffles vs the unnest → per-doc-groupBy shape
  // the oracle uses.
  val q79 = q("q79_ttr",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |w AS (SELECT doc_id, unnest(t) AS w FROM d),
      |c AS (SELECT doc_id, w, COUNT(*) AS n FROM w GROUP BY 1, 2)
      |SELECT doc_id,
      |  CAST(SUM(n) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_types,
      |  CAST(COUNT(*) FILTER (n = 1) AS BIGINT) AS n_hapax,
      |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS ttr
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // `sorted` must be a materialized column: element_at on an inline
    // array_sort(split(...)) would re-sort (and re-split) per element.
    val sorted = col("_s")
    val n = size(sorted)
    val idx = sequence(lit(1), n)
    def at(i: Column) = element_at(sorted, i)
    def isNew(i: Column) = (i === 1) || (at(i) =!= at(i - 1))
    def isLastOfRun(i: Column) = (i === n) || (at(i + 1) =!= at(i))
    val types = size(filter(idx, i => isNew(i)))
    val hapax = size(filter(idx, i => isNew(i) && isLastOfRun(i)))
    Tables(s, dir).documents.withColumn("_s", array_sort(toks)).select(
      col("doc_id"),
      n.cast("long").as("n_tokens"),
      types.cast("long").as("n_types"),
      hapax.cast("long").as("n_hapax"),
      (types.cast("double") / n.cast("double")).as("ttr"))
      .orderBy("doc_id")
  }

  // -- q80: Zipf head — top-50 corpus tokens with cumulative share ------
  // Token counts partial-aggregate before the vocabulary shuffle. The
  // vocabulary itself is NOT small at web scale (10⁸–10⁹ distinct
  // tokens), so nothing may sort it globally: the head is taken with
  // orderBy+limit — plans as TakeOrderedAndProject, a per-partition
  // top-50 followed by a driver-side merge of 50-row partials — and
  // rank/cumulative-share are computed on those 50 rows by a broadcast
  // self-join (no window: an empty-partition window would put the whole
  // vocabulary, or at best the head, through one task). The corpus
  // total rides in as a broadcast scalar. Correct because every token
  // ranked at-or-before a head row is itself in the head, so the
  // 50-row join sees exactly the global prefix it needs.
  val q80 = q("q80_zipf",
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |c AS (SELECT word, COUNT(*) AS n FROM w GROUP BY 1),
      |r AS (SELECT word, n,
      |        CAST(row_number() OVER (ORDER BY n DESC, word) AS INTEGER) AS rnk,
      |        CAST(SUM(n) OVER (ORDER BY n DESC, word
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |        CAST(SUM(n) OVER () AS BIGINT) AS total
      |      FROM c)
      |SELECT word, n, rnk, CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
      |FROM r WHERE rnk <= 50 ORDER BY rnk""".stripMargin) { (s, dir) =>
    val counts = Tables(s, dir).documents
      .select(explode(toks).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val head = counts.orderBy(col("n").desc, col("word")).limit(50)
    val ranked = head.join(
        broadcast(head.select(col("n").as("n2"), col("word").as("word2"))),
        col("n2") > col("n") || (col("n2") === col("n") && col("word2") <= col("word")))
      .groupBy(col("word"), col("n"))
      .agg(count(lit(1)).cast("int").as("rnk"), sum(col("n2")).as("cum"))
    ranked.crossJoin(broadcast(total))
      .select(col("word"), col("n"), col("rnk"),
        (col("cum").cast("double") / col("total").cast("double")).as("cum_share"))
      .orderBy("rnk")
  }

  // -- q81: C4/Gopher-style quality gate with reasons -------------------
  // Every signal (length, diversity, repetition) is computed inside the
  // row — the whole gate is one map-only pass; concat_ws skips NULL
  // reason slots in both engines. The oracle recomputes repetition via
  // the per-doc groupBy shape, proving the per-row fold equivalent.
  val q81 = q("q81_quality_gate",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b
      |       FROM d WHERE len(t) >= 2),
      |rep AS (SELECT doc_id, CAST(max(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS rep_ratio
      |        FROM (SELECT doc_id, b, COUNT(*) AS n FROM bg GROUP BY 1, 2) GROUP BY 1),
      |sig AS (SELECT d.doc_id,
      |          CAST(len(t) AS BIGINT) AS n_tokens,
      |          CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS ttr,
      |          COALESCE(rep.rep_ratio, 0.0) AS rep_ratio
      |        FROM d LEFT JOIN rep ON d.doc_id = rep.doc_id)
      |SELECT doc_id, n_tokens,
      |  concat_ws(',',
      |    CASE WHEN n_tokens < 15 THEN 'too_short' END,
      |    CASE WHEN n_tokens > 90 THEN 'too_long' END,
      |    CASE WHEN ttr < 0.34 THEN 'low_diversity' END,
      |    CASE WHEN rep_ratio > 0.09 THEN 'repetitive' END) AS reasons,
      |  (n_tokens >= 15 AND n_tokens <= 90 AND ttr >= 0.34 AND rep_ratio <= 0.09) AS keep
      |FROM sig ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val t = col("_t")
    val n = size(t)
    val ttr = size(array_distinct(t)).cast("double") / n.cast("double")
    val sortedBg = array_sort(graft.functions.expr.TextExpressions.spanJoin(t, 2))
    val rep = when(n >= 2,
      TextOps2.longestRun(sortedBg).cast("double") / (n - 1).cast("double"))
      .otherwise(lit(0.0))
    // Signals materialize in their own projection so each is computed
    // once per row (rep/ttr are referenced by both reasons and keep).
    tokenized(s, dir)
      .select(col("doc_id"), n.cast("long").as("n_tokens"),
        ttr.as("_ttr"), rep.as("_rep"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        concat_ws(",",
          when(col("n_tokens") < 15, "too_short"),
          when(col("n_tokens") > 90, "too_long"),
          when(col("_ttr") < 0.34, "low_diversity"),
          when(col("_rep") > 0.09, "repetitive")).as("reasons"),
        (col("n_tokens") >= 15 && col("n_tokens") <= 90 &&
          col("_ttr") >= 0.34 && col("_rep") <= 0.09).as("keep"))
      .orderBy("doc_id")
  }

  // -- q82: containment (asymmetric near-dup: is A mostly inside B?) ----
  // Same salted block join as q28, but the native merge-walk returns the
  // raw |A∩B| count so containment stays an exact integer ratio. Finds
  // the quote/aggregator relationship Jaccard misses when |B| ≫ |A|.
  val q82 = q("q82_containment",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |s AS (SELECT doc_id, t[1] AS first_tok,
      |        CASE WHEN len(t) >= 2
      |             THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |             ELSE list_distinct(t) END AS sh
      |      FROM d),
      |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / CAST(len(a.sh) AS DOUBLE) AS containment
      |      FROM s a JOIN s b ON a.first_tok = b.first_tok AND a.doc_id <> b.doc_id)
      |SELECT a_id, b_id, containment FROM p WHERE containment >= 0.2
      |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
    val S = 8
    val d = Dedup.docShingled(s, dir)
    val a = d.select(col("doc_id").as("a_id"), col("first_tok"), col("shh").as("a_sh"))
      .withColumn("salt", pmod(col("a_id"), lit(S)).cast("int"))
    val b = d.select(col("doc_id").as("b_id"), col("first_tok"), col("shh").as("b_sh"))
      .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
    a.join(b, Seq("first_tok", "salt"))
      .where(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        (SimilarityExpressions.intersectSortedLong(col("a_sh"), col("b_sh")).cast("double") /
          size(col("a_sh")).cast("double")).as("containment"))
      .where(col("containment") >= 0.2)
      .orderBy("a_id", "b_id")
  }

  // -- q83: linear-regression aggregates --------------------------------
  // regr_* are order-dependent double accumulations (like q52's
  // corr/covar): round(6) absorbs the reassociation difference between
  // engines while still pinning 6 significant decimals.
  val q83 = q("q83_regression",
    """SELECT l_returnflag,
      |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy("l_returnflag")
  }

  // -- q84: near-dup pairs → duplicate clusters (connected components) --
  // The step after any pair-finding dedup: transitively close the pair
  // graph so each group keeps exactly one representative. Edges come
  // from the UNBLOCKED exact prefix-filtered all-pairs join
  // ([[Dedup.allPairsJaccard]]: 4-token shingles, near-dup threshold
  // 0.5) — full recall with no Zipf natural-key block — then
  // [[graft.operators.ConnectedComponents]] (min-label propagation,
  // O(diameter) distributed rounds). The oracle is a recursive CTE over
  // the brute-force pair set (equivalent by the prefix-filter
  // completeness theorem; O(n²) is fine at oracle SF).
  val q84 = q("q84_dup_clusters",
    """WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |s AS MATERIALIZED (SELECT doc_id,
      |        CASE WHEN len(t) >= 4
      |             THEN list_distinct(list_transform(range(1, len(t) - 2),
      |                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
      |             ELSE list_distinct(t) END AS sh
      |      FROM d),
      |p AS MATERIALIZED (SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |      FROM s a JOIN s b ON a.doc_id < b.doc_id
      |      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |            CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5),
      |e AS MATERIALIZED (SELECT a_id AS u, b_id AS v FROM p UNION ALL SELECT b_id, a_id FROM p),
      |r AS (SELECT u AS node, u AS reach FROM e
      |      UNION
      |      SELECT r.node, e.v FROM r JOIN e ON r.reach = e.u)
      |SELECT node AS doc_id, min(reach) AS cluster_id
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val edges = Dedup.allPairsJaccard(s, dir, 0.5).select(col("a_id"), col("b_id"))
    graft.operators.ConnectedComponents.minLabelPropagation(edges)
      .select(col("node").as("doc_id"), col("comp").as("cluster_id"))
      .orderBy("doc_id")
  }

  // -- q85: fuzzy record linkage (Jaro-Winkler over blocked pairs) ------
  // The native kernel against DuckDB's jaro_winkler_similarity — a
  // cross-engine check of the whole algorithm (match window,
  // half-transpositions, 0.7-gated prefix boost). Pairs are blocked on
  // (brand, type) so the pair space stays |block|²-bounded; round(6)
  // absorbs any final-arithmetic ULP difference between engines.
  val q85 = q("q85_fuzzy_linkage",
    """SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
      |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_type = b.p_type AND a.p_partkey < b.p_partkey
      |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.88
      |ORDER BY a_key, b_key""".stripMargin) { (s, dir) =>
    val p = Tables(s, dir).part
    val a = p.select(col("p_partkey").as("a_key"), col("p_brand"), col("p_type"), col("p_name").as("a_name"))
    val b = p.select(col("p_partkey").as("b_key"), col("p_brand"), col("p_type"), col("p_name").as("b_name"))
    val jw = SimilarityExpressions.jaroWinkler(col("a_name"), col("b_name"))
    a.join(b, Seq("p_brand", "p_type"))
      .where(col("a_key") < col("b_key") && jw >= 0.88)
      .select(col("a_key"), col("b_key"), round(jw, 6).as("jw"))
      .orderBy("a_key", "b_key")
  }

  // -- q86: hopping (sliding) windows over event time -------------------
  // Spark's window(ts, 1h, 30m) assigns each event to its two
  // overlapping hops; the oracle unnests the same two aligned starts
  // per event. Streaming twin: identical groupBy(window(...)) under
  // readStream with a watermark (EventTimeSpec).
  val q86 = q("q86_hopping_window",
    """WITH e AS (SELECT ts, value,
      |    unnest([time_bucket(INTERVAL 30 MINUTES, ts),
      |            time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES]) AS wstart
      |  FROM events)
      |SELECT strftime(wstart, '%Y-%m-%d %H:%M') AS window_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM e GROUP BY wstart ORDER BY window_start""".stripMargin) { (s, dir) =>
    Tables(s, dir).events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sumDec(col("value")).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("n_events"), col("total_value"))
      .orderBy("window_start")
  }

  // -- q87: percentile gate — top-decile docs by length per language ----
  // percent_rank over a TOTAL order (n_tokens, doc_id) is an exact
  // integer ratio, so the decile boundary is engine-independent. The
  // quantile-based selection shape for curation ("keep the longest 10%
  // per language").
  val q87 = q("q87_percentile_gate",
    """WITH d AS (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |           FROM documents),
      |r AS (SELECT doc_id, lang, n_tokens,
      |        percent_rank() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS pr
      |      FROM d)
      |SELECT doc_id, lang, n_tokens FROM r WHERE pr >= 0.9
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("lang").orderBy(col("n_tokens"), col("doc_id"))
    Tables(s, dir).documents
      .select(col("doc_id"), col("lang"), size(toks).cast("long").as("n_tokens"))
      .withColumn("pr", percent_rank().over(w))
      .where(col("pr") >= 0.9)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .orderBy("doc_id")
  }

  // -- q88: bigram language-model counts with conditional probability ---
  // Corpus-wide bigram statistics (the n-gram-LM shape): counts partial-
  // aggregate map-side; p(w2|w1) is an integer-ratio division joined
  // from the unigram-context count — broadcast, since contexts are
  // vocabulary-sized.
  val q88 = q("q88_bigram_lm",
    """WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
      |              unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
      |       FROM d WHERE len(t) >= 2),
      |bc AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
      |uc AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS ctx_n FROM bc GROUP BY 1)
      |SELECT w1, w2, n, ctx_n,
      |  CAST(n AS DOUBLE) / CAST(ctx_n AS DOUBLE) AS p_cond
      |FROM bc JOIN uc USING (w1)
      |WHERE n >= 2 ORDER BY w1, w2""".stripMargin) { (s, dir) =>
    val t = col("_t")
    // codegen-native bigram pairs (see TextKernels.bigramPairs): exact
    // twin of the transform(sequence, struct(element_at)) HOF
    val pairs = graft.functions.expr.TextExpressions.bigramPairs(t)
    // ctx_n via a window over w1 rather than a self-join: the bigram
    // aggregation subtree is computed once (a self-join would execute
    // it twice), and the context sum reuses the vocabulary-sized
    // aggregate with one narrow exchange.
    tokenized(s, dir)
      .where(size(t) >= 2)
      .select(explode(pairs).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .withColumn("ctx_n", sum(col("n")).over(Window.partitionBy("w1")))
      .where(col("n") >= 2)
      .select(col("w1"), col("w2"), col("n"), col("ctx_n"),
        (col("n").cast("double") / col("ctx_n").cast("double")).as("p_cond"))
      .orderBy("w1", "w2")
  }

  // -- q89: the end-to-end curation pipeline ----------------------------
  // Quality gate (per-row signals) ∩ exact-dedup keeper (min doc_id per
  // content hash) ∩ not a near-dup loser (larger id of any strong
  // Jaccard pair) — the kept corpus a training run would read. Three
  // independent predicates, so the result is order-insensitive and
  // exactly reproducible. Plan shape: one map-only signal pass, one
  // hash-shuffle groupBy (exact groups), one prefix-filtered pair join
  // (near dups, exact and unblocked) — the funnel's extra cost over its
  // parts is two narrow shuffles.
  val q89 = q("q89_curation_pipeline",
    """WITH d AS (SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b
      |       FROM d WHERE len(t) >= 2),
      |rep AS (SELECT doc_id, CAST(max(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS rep_ratio
      |        FROM (SELECT doc_id, b, COUNT(*) AS n FROM bg GROUP BY 1, 2) GROUP BY 1),
      |sig AS (SELECT d.doc_id, d.lang,
      |          CAST(len(t) AS BIGINT) AS n_tokens,
      |          CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS ttr,
      |          COALESCE(rep.rep_ratio, 0.0) AS rep_ratio
      |        FROM d LEFT JOIN rep ON d.doc_id = rep.doc_id),
      |gate AS (SELECT doc_id, lang, n_tokens FROM sig
      |         WHERE n_tokens BETWEEN 15 AND 90 AND ttr >= 0.34 AND rep_ratio <= 0.09),
      |ek AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY md5(text)),
      |sh AS (SELECT doc_id,
      |         CASE WHEN len(t) >= 4
      |              THEN list_distinct(list_transform(range(1, len(t) - 2),
      |                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
      |              ELSE list_distinct(t) END AS sh
      |       FROM d),
      |losers AS (SELECT DISTINCT b.doc_id FROM sh a JOIN sh b
      |           ON a.doc_id < b.doc_id
      |           WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |                 CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5)
      |SELECT doc_id, lang, n_tokens
      |FROM gate JOIN ek USING (doc_id)
      |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents
    // The gate runs inside a Filter, which does no subexpression
    // elimination: the lambda-form signals would re-split the text per
    // element access. One kernel call per row instead (bit-identical
    // thresholds/divisions — see TextKernels.qualityGate).
    val gated = docs
      .where(graft.functions.expr.TextExpressions.qualityGate(
        col("text"), 15, 90, 0.34, 0.09))
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val exactKeepers = docs.groupBy(md5(col("text"))).agg(min(col("doc_id")).as("doc_id"))
    // Near-dup losers via the UNBLOCKED prefix-filtered exact join
    // (Dedup.allPairsJaccard) — full recall, no Zipf first-token block;
    // at t=0.5 the prefix is only ~half of each shingle set, so the
    // candidate index is small. This is the stage that must survive a
    // 100 TB corpus, and it is now the same exact algorithm at every SF.
    val nearDupLosers = Dedup.allPairsJaccard(s, dir, 0.5)
      .select(col("b_id").as("doc_id"))
      .distinct()
    gated
      .join(exactKeepers, Seq("doc_id"), "left_semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  // -- q99: quality-weighted subsampling (importance resampling) --------
  // Each document's acceptance probability is proportional to a quality
  // signal (here: lexical diversity), realized deterministically by
  // comparing a per-doc hash draw (QueryDsl.crossHash60 — overflow-free
  // at any id range, unlike an integer-multiply mix) against the
  // weight — the auditable form of importance sampling for data mixing:
  // same corpus + same weights ⇒ same sample, on any cluster, in any
  // engine. Map-only.
  val q99 = q("q99_weighted_sample",
    s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      |w AS (SELECT doc_id, lang,
      |        least(1.0, CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) AS wt
      |      FROM d)
      |SELECT doc_id, lang, round(wt, 6) AS weight
      |FROM w
      |WHERE ${graft.QueryDsl.crossHash60Sql("doc_id")} % 10000 < wt * 10000
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.QueryDsl.crossHash60
    val t = col("_t")
    val wt = least(lit(1.0), size(array_distinct(t)).cast("double") / size(t).cast("double"))
    tokenized(s, dir)
      .select(col("doc_id"), col("lang"), wt.as("wt"))
      .where(pmod(crossHash60(col("doc_id")), lit(10000)) < col("wt") * 10000)
      .select(col("doc_id"), col("lang"), round(col("wt"), 6).as("weight"))
      .orderBy("doc_id")
  }

  // -- q101: per-document fluency under the corpus bigram LM ------------
  // The CCNet/perplexity-filter shape: score every document by how
  // predictable its bigrams are under the corpus-wide language model,
  // then gate or mix on the score. Scoring avoids transcendentals on
  // purpose — avg/min of conditional probabilities p(w2|w1) = n/ctx_n,
  // each an exact int/int IEEE division identical in both engines;
  // per-term round(9) → exact decimal sum → one double division keeps
  // the aggregate order-independent, so the whole signal hash-matches
  // the oracle (a ln()-based perplexity would differ in final ulps
  // between libm implementations). Plan: one bigram aggregate (map-side
  // partial), context sums via a window over the vocabulary-sized
  // aggregate, a broadcast-sized join back to doc bigrams, one per-doc
  // aggregate.
  /** q101's scoring core — (doc_id, n_bigrams, avg_p, min_p) under the
    * corpus bigram LM — exposed so q191's CCNet-style fluency
    * bucketing reuses the exact relation the q101 oracle proves.
    * See q101's scaladoc for the transcendental-free determinism
    * argument and the broadcast-build-side note. */
  private[graft] def bigramFluency(s: SparkSession, dir: String): DataFrame = {
    val t = col("_t")
    // codegen-native bigram pairs (see TextKernels.bigramPairs): exact
    // twin of the transform(sequence, struct(element_at)) HOF
    val pairs = graft.functions.expr.TextExpressions.bigramPairs(t)
    val bg = tokenized(s, dir)
      .where(size(t) >= 2)
      .select(col("doc_id"), explode(pairs).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .withColumn("ctx_n", sum(col("n")).over(Window.partitionBy("w1")))
    // Build side must be the LM (bigram-type vocabulary), never the
    // corpus bigram stream: parquet stats undersell the exploded side,
    // so without the hint Catalyst broadcast the corpus (BuildLeft) —
    // a driver-sized hash relation of every bigram occurrence. The LM
    // is vocabulary-sized; when it outgrows a broadcast (web-scale
    // vocab) drop the hint and this becomes a shuffle join on (w1,w2).
    bg.join(broadcast(uc), Seq("w1", "w2"))
      .select(col("doc_id"), (col("n").cast("double") / col("ctx_n").cast("double")).as("p"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(round(col("p"), 9).cast("decimal(18,9)")).cast("double") / count(lit(1))).as("avg_p"),
        min(col("p")).as("min_p"))
  }

  val q101 = q("q101_bigram_fluency",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id,
      |         unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
      |         unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
      |       FROM d WHERE len(t) >= 2),
      |bc AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
      |uc AS (SELECT w1, w2, n, CAST(SUM(n) OVER (PARTITION BY w1) AS BIGINT) AS ctx_n FROM bc),
      |term AS (SELECT doc_id, CAST(n AS DOUBLE) / CAST(ctx_n AS DOUBLE) AS p
      |         FROM bg JOIN uc USING (w1, w2))
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(CAST(round(p, 9) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_p,
      |  min(p) AS min_p
      |FROM term GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    bigramFluency(s, dir).orderBy("doc_id")
  }

  // -- q103: benchmark decontamination (n-gram overlap) -----------------
  // The GPT-3/PaLM eval-hygiene pass: drop training documents sharing
  // any n-gram with an evaluation benchmark (Brown et al. 2020 §C used
  // 13-grams; 8 tokens here to match q78's span unit on this corpus).
  // The benchmark split is a deterministic hash slice so both engines
  // (and re-runs) agree on it. Scale shape: eval suites are MBs while
  // the corpus is TBs — benchmark spans deduplicate to a tiny set that
  // BROADCASTS, so the corpus-side span explode is map-only with no
  // corpus shuffle; only contaminated (doc, span) hits reach the final
  // per-doc aggregate.
  val q103 = q("q103_decontamination",
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sp AS (SELECT doc_id,
      |         unnest(list_transform(range(1, len(t) - 6),
      |                i -> list_aggregate(t[i:i+7], 'string_agg', ' '))) AS span
      |       FROM d WHERE len(t) >= 8),
      |b AS (SELECT DISTINCT span, doc_id AS bench_doc FROM sp
      |      WHERE ${graft.QueryDsl.crossHash60Sql("doc_id")} % 20 = 0),
      |tr AS (SELECT doc_id, span FROM sp
      |       WHERE ${graft.QueryDsl.crossHash60Sql("doc_id")} % 20 <> 0)
      |SELECT doc_id,
      |  CAST(COUNT(DISTINCT span) AS BIGINT) AS n_shared_spans,
      |  CAST(COUNT(DISTINCT bench_doc) AS BIGINT) AS n_bench_docs,
      |  min(span) AS sample_span
      |FROM tr JOIN b USING (span)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.QueryDsl.crossHash60
    val t = col("_t")
    val spans = graft.functions.expr.TextExpressions.spanJoin(t, 8)
    val sp = tokenized(s, dir)
      .where(size(t) >= 8)
      .select(col("doc_id"), pmod(crossHash60(col("doc_id")), lit(20)).as("slice"),
        explode(spans).as("span"))
    val bench = sp.where(col("slice") === 0)
      .select(col("span"), col("doc_id").as("bench_doc")).distinct()
    sp.where(col("slice") =!= 0)
      .join(broadcast(bench), Seq("span"))
      .groupBy("doc_id")
      .agg(
        countDistinct(col("span")).as("n_shared_spans"),
        countDistinct(col("bench_doc")).as("n_bench_docs"),
        min(col("span")).as("sample_span"))
      .orderBy("doc_id")
  }

  // -- q104: deterministic training-shard packing manifest --------------
  // The last mile before the tokenizer: assign every document to a
  // fixed shard by content-independent hash — a reproducible global
  // shuffle that breaks source/temporal correlation (consecutive crawl
  // pages land in different shards) without a sort, and a per-shard
  // manifest (docs, tokens, bytes) that training-side loaders consume.
  // Map-only assignment + one partial-aggregated groupBy on the shard
  // id; balance is hash-uniform regardless of corpus skew (asserted in
  // SamplingSpec). The physical write is `PartitionedTableSink` with
  // shard as the partition column; this query is the manifest.
  val q104 = q("q104_shard_pack",
    s"""WITH d AS (SELECT ${graft.QueryDsl.crossHash60Sql("doc_id")} % 16 AS shard,
      |             len(string_split(text, ' ')) AS n_tokens, n_chars
      |           FROM documents)
      |SELECT shard, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_bytes
      |FROM d GROUP BY shard ORDER BY shard""".stripMargin) { (s, dir) =>
    import graft.QueryDsl.crossHash60
    Tables(s, dir).documents
      .select(pmod(crossHash60(col("doc_id")), lit(16)).as("shard"),
        size(toks).as("n_tokens"), col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        sum(col("n_chars")).cast("long").as("n_bytes"))
      .orderBy("shard")
  }

  // -- q105: temperature-scaled language-mixture weights ----------------
  // The multilingual data-mixing recipe (XLM-R/mT5: sample language l
  // with probability ∝ p_l^τ, upweighting low-resource languages):
  // emit, per language, its corpus share and the sampling weight that
  // realizes the τ-tempered target mixture. τ = 0.5 on purpose — sqrt
  // is IEEE-correctly-rounded in BOTH engines, unlike pow(), so the
  // tempered shares are bit-identical; the normalizer Σ√p is made
  // accumulation-order-independent by the q101 trick (round(9) → exact
  // DECIMAL sum → one double division). Language-sized output, two
  // partial-aggregated shuffles — the audit table a 100 TB mixing run
  // is driven by.
  val q105 = q("q105_lang_mix",
    """WITH l AS (SELECT lang, COUNT(*) AS n_docs,
      |             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |           FROM documents GROUP BY lang),
      |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM l),
      |sq AS (SELECT lang, n_docs, n_tokens, total_docs,
      |         CAST(round(sqrt(CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE)), 9)
      |              AS DECIMAL(18,9)) AS sq9
      |       FROM l CROSS JOIN t),
      |z AS (SELECT CAST(SUM(sq9) AS DOUBLE) AS z FROM sq)
      |SELECT lang, n_docs, n_tokens,
      |  round(CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE), 6) AS share,
      |  round(CAST(sq9 AS DOUBLE) / z * CAST(total_docs AS DOUBLE)
      |        / CAST(n_docs AS DOUBLE), 6) AS weight
      |FROM sq CROSS JOIN z ORDER BY lang""".stripMargin) { (s, dir) =>
    val per = Tables(s, dir).documents
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(size(toks)).cast("long").as("n_tokens"))
    val tot = per.agg(sum(col("n_docs")).cast("long").as("total_docs"))
    val sq = per.crossJoin(broadcast(tot))
      .withColumn("sq9",
        round(sqrt(col("n_docs").cast("double") / col("total_docs").cast("double")), 9)
          .cast("decimal(18,9)"))
    val z = sq.agg(sum(col("sq9")).cast("double").as("z"))
    sq.crossJoin(broadcast(z))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_docs").cast("double") / col("total_docs").cast("double"), 6).as("share"),
        round(col("sq9").cast("double") / col("z") * col("total_docs").cast("double")
          / col("n_docs").cast("double"), 6).as("weight"))
      .orderBy("lang")
  }

  val all: Seq[GraftQuery] = Seq(q77, q78, q79, q80, q81, q82, q83, q84, q85,
    q86, q87, q88, q89, q99, q101, q103, q104, q105)
}
