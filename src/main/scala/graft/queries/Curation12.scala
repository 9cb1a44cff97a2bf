package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Twelfth curation batch: the remaining pre-training data-hygiene
  * stages a CCNet/Gopher/Dolma-class pipeline runs that were not yet
  * first-class here — the Gopher repetition-free quality rule bundle
  * (Rae et al. 2021 §A1.1), per-domain document capping (Dolma's
  * "limit pages per registered domain"), deterministic hash-based
  * train/val/test splitting, and margin-based nearest-neighbor mining
  * (Artetxe & Schwenk 2019's ratio margin, the standard bitext /
  * neighbor-mining confidence score).
  *
  * Reference scope note: the reference pipeline framework
  * (/root/reference/motorway) has no relational curation surface —
  * these extend the engine along SURVEY §2's "LLM-data-pipeline"
  * axis, with every query oracle-gated against DuckDB.
  */
object Curation12 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  // -- q170: Gopher-style quality rule bundle ---------------------------
  // The corpus text is clean synthetic prose, so the symbol/alpha rules
  // would be degenerate on it; per the q120/q165/q169 augmentation
  // discipline a "dirty" variant is DERIVED deterministically in both
  // engines (hash-mod classes of docs gain '#' runs, ellipsis runs, and
  // numeric tokens) and the rules run on that. Five Gopher §A1.1 rules:
  // word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  // alphabetic-word fraction, and stop-word presence (≥2 distinct).
  //
  // Scale: per-row map-side signals over one scan — no shuffle, no
  // Expand; the higher-order functions run inside whole-stage codegen.
  // Output is per-doc (the downstream filter join wants row-level
  // verdicts, not a census).
  private val dirtySql =
    "text || (CASE WHEN doc_id % 7 = 0 THEN ' # # #' ELSE '' END)" +
      " || (CASE WHEN doc_id % 11 = 0 THEN ' ... ... ...' ELSE '' END)" +
      " || (CASE WHEN doc_id % 13 = 0 THEN ' 1234 99 7' ELSE '' END)"

  /** The q170 dirty-variant derivation as a Column — shared with the
    * streaming gate's spec so both engines (and the stream) score the
    * same augmented corpus. */
  private[graft] def gopherDirty(text: Column, docId: Column): Column =
    concat(text,
      when(docId % 7 === 0, lit(" # # #")).otherwise(lit("")),
      when(docId % 11 === 0, lit(" ... ... ...")).otherwise(lit("")),
      when(docId % 13 === 0, lit(" 1234 99 7")).otherwise(lit("")))

  /** Appends the Gopher §A1.1 signal columns (`n_words`, and the
    * scaled-integer `mwl_l`/`sym_l`/`alpha_l` ratios, `n_stop`) plus
    * the `keep` verdict to any relation carrying `text` — the kernel
    * shared verbatim by q170 and [[graft.streaming.StreamingQualityGate]],
    * so the live gate and the batch census agree by construction. All
    * signals are per-row higher-order functions: map-side, no shuffle. */
  private[graft] def withGopherSignals(df: DataFrame, text: Column): DataFrame = {
    val t = col("_gopher_t")
    val n = size(t)
    val sumLen = aggregate(t, lit(0L), (a, w) => a + length(w).cast(LongType))
    def scaled(num: Column): Column =
      round(num.cast(DoubleType) * 10000 / n).cast(LongType)
    df.withColumn("_gopher_t", split(text, " "))
      .withColumn("n_words", n.cast(LongType))
      .withColumn("mwl_l", scaled(sumLen))
      .withColumn("sym_l", scaled(size(filter(t, w => w === "#" || w === "..."))))
      .withColumn("alpha_l", scaled(size(filter(t, w => w.rlike("[a-z]")))))
      .withColumn("n_stop",
        size(array_intersect(array_distinct(t),
          array(lit("the"), lit("a"), lit("of"), lit("to"), lit("and"), lit("in"))))
          .cast(LongType))
      .withColumn("keep",
        col("n_words").between(20, 80) && col("mwl_l").between(30000, 100000) &&
          col("sym_l") <= 1000 && col("alpha_l") >= 8000 && col("n_stop") >= 2)
      .drop("_gopher_t")
  }
  // Cross-engine float discipline (shared by q172/q173): every ratio is
  // rounded in SCALED-INTEGER space — round(count·10⁴/n) at scale 0 —
  // never round(count/n, 4). Decimal halves at scale 0 are exactly
  // representable doubles, so Spark's BigDecimal HALF_UP (which reads
  // the double's shortest decimal string) and DuckDB's binary
  // half-away-from-zero agree; at scale 4 the half targets (x.xxxx5)
  // are NOT representable and the two reads diverge on exact-half
  // quotients like 3/160. Rule thresholds compare the integer forms.
  val q170 = q("q170_gopher_rules",
    s"""WITH d AS (SELECT doc_id, $dirtySql AS dirty FROM documents),
      |t AS (SELECT doc_id, string_split(dirty, ' ') AS t FROM d),
      |sig AS (SELECT doc_id,
      |    CAST(len(t) AS BIGINT) AS n_words,
      |    CAST(round(CAST(list_sum(list_transform(t, w -> len(w))) AS DOUBLE)
      |          * 10000 / len(t)) AS BIGINT) AS mwl_l,
      |    CAST(round(CAST(len(list_filter(t, w -> w IN ('#', '...'))) AS DOUBLE)
      |          * 10000 / len(t)) AS BIGINT) AS sym_l,
      |    CAST(round(CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
      |          * 10000 / len(t)) AS BIGINT) AS alpha_l,
      |    CAST(len(list_intersect(list_distinct(t),
      |         ['the', 'a', 'of', 'to', 'and', 'in'])) AS BIGINT) AS n_stop
      |  FROM t)
      |SELECT doc_id, n_words,
      |  mwl_l / 10000.0 AS mean_word_len,
      |  sym_l / 10000.0 AS symbol_ratio,
      |  alpha_l / 10000.0 AS alpha_ratio,
      |  n_stop,
      |  (n_words BETWEEN 20 AND 80 AND mwl_l BETWEEN 30000 AND 100000
      |   AND sym_l <= 1000 AND alpha_l >= 8000 AND n_stop >= 2) AS keep
      |FROM sig ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val base = Tables(s, dir).documents
      .select(col("doc_id"), gopherDirty(col("text"), col("doc_id")).as("dirty"))
    val sig = withGopherSignals(base, col("dirty"))
    sig.select(col("doc_id"), col("n_words"),
        (col("mwl_l") / 10000.0).as("mean_word_len"),
        (col("sym_l") / 10000.0).as("symbol_ratio"),
        (col("alpha_l") / 10000.0).as("alpha_ratio"),
        col("n_stop"), col("keep"))
      .orderBy("doc_id")
  }

  // -- q171: per-domain document cap ------------------------------------
  // Crawl pipelines cap pages per registered domain so no single host
  // dominates the mixture. Domains are derived deterministically
  // (37 synthetic hosts spanning sources); within each domain docs rank
  // by quality (n_chars DESC, doc_id tiebreak) and only the top
  // MaxPerDomain survive. Output: per-domain census of kept/dropped and
  // the characters retained.
  //
  // Scale: ONE hash shuffle on the domain key; the row_number window
  // and the census aggregation share that partitioning, so Catalyst
  // reuses the exchange (no second shuffle). Per-domain cap bounds the
  // window state; caps are what PREVENT skew here — a pathological host
  // with 10⁹ pages still streams through its window since row_number
  // needs no buffering beyond the sort, and the sort spills.
  private val MaxPerDomain = 8
  private val domSql = "'d' || CAST(doc_id % 37 AS VARCHAR) || '.example.com'"
  val q171 = q("q171_domain_cap",
    s"""WITH d AS (SELECT doc_id, n_chars, $domSql AS domain FROM documents),
      |r AS (SELECT domain, n_chars,
      |        row_number() OVER (PARTITION BY domain
      |                           ORDER BY n_chars DESC, doc_id) AS rk
      |      FROM d)
      |SELECT domain,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN rk <= $MaxPerDomain THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(SUM(CASE WHEN rk > $MaxPerDomain THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dropped,
      |  CAST(SUM(CASE WHEN rk <= $MaxPerDomain THEN n_chars ELSE 0 END) AS BIGINT)
      |    AS chars_kept
      |FROM r GROUP BY domain ORDER BY domain""".stripMargin) { (s, dir) =>
    val dom = concat(lit("d"), (col("doc_id") % 37).cast("string"), lit(".example.com"))
    val w = Window.partitionBy("domain").orderBy(col("n_chars").desc, col("doc_id"))
    Tables(s, dir).documents
      .select(col("doc_id"), col("n_chars"), dom.as("domain"))
      .withColumn("rk", row_number().over(w))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rk") <= MaxPerDomain, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") > MaxPerDomain, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("rk") <= MaxPerDomain, col("n_chars")).otherwise(0L))
          .as("chars_kept"))
      .orderBy("domain")
  }

  // -- q172: deterministic hash split (train/val/test) ------------------
  // Split assignment must be a pure function of the record identity —
  // rand() splits leak across re-runs and engines; a hash split is
  // reproducible, auditable, and stable under corpus growth (a doc's
  // split never changes when neighbors are added). The draw is the
  // first 2 hex chars of md5(doc_id:source) compared lexicographically
  // (256 buckets: 13 val / 13 test / 230 train ≈ 5/5/90) — hex-string
  // compare is byte-identical in both engines, and the md5 keyspace
  // never overflows anything at 100 TB id ranges (same rationale as
  // QueryDsl.crossHash60).
  //
  // Scale: split assignment is map-side; the census is one partial-agg
  // shuffle on (source, split) — |sources|×3 rows out. The pct column
  // recomputes per-source totals via a window over the TINY census
  // relation, not the corpus.
  private val splitSql =
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 2) < '0d'" +
      " THEN 'val'" +
      " WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 2) < '1a'" +
      " THEN 'test' ELSE 'train' END"
  val q172 = q("q172_hash_split",
    s"""WITH d AS (SELECT source, n_chars, $splitSql AS split FROM documents),
      |c AS (SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |        CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |      FROM d GROUP BY 1, 2)
      |SELECT source, split, n_docs, n_chars,
      |  CAST(round(CAST(n_docs AS DOUBLE) * 10000 /
      |        SUM(n_docs) OVER (PARTITION BY source)) AS BIGINT) / 10000.0 AS pct
      |FROM c ORDER BY source, split""".stripMargin) { (s, dir) =>
    val h = substring(md5(concat(col("doc_id").cast("string"), lit(":"), col("source"))), 1, 2)
    val splitCol = when(h < "0d", "val").when(h < "1a", "test").otherwise("train")
    val census = Tables(s, dir).documents
      .select(col("source"), col("n_chars"), splitCol.as("split"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    census.withColumn("pct",
        round(col("n_docs").cast(DoubleType) * 10000 /
            sum(col("n_docs")).over(Window.partitionBy("source")))
          .cast(LongType) / 10000.0)
      .orderBy("source", "split")
  }

  // -- q173: margin-based nearest-neighbor mining -----------------------
  // The ratio margin of Artetxe & Schwenk (2019): a match is trusted
  // not when its cosine is high in absolute terms but when it stands
  // OUT from the query's neighborhood — margin = cos(top1) / mean(cos
  // of top-k). Used for bitext mining, near-dup triage, and retrieval
  // confidence gating. Queries are the vec_id % 40 == 0 sample; k = 8.
  //
  // Cross-engine float discipline: mining runs over the SQ-quantized
  // grid (components snapped to round(x·10³), the q98 discipline) —
  // quantized dot and norms are then EXACT integer-valued arithmetic
  // (products ≤ 10⁶, sums ≤ 6.4·10⁷, na·nb ≤ 4.1·10¹⁵ < 2⁵³), so the
  // cosine dot/√(na·nb) sees bit-identical operands in both engines
  // regardless of either engine's accumulation order. (An un-quantized
  // twin is NOT hash-comparable: DuckDB's list_cosine_similarity
  // differs from the dot/√(na·nb) kernel by an ulp — observed flipping
  // a ×10⁴ quantization at sf0.1 — which is exactly why mining-scale
  // pipelines dedupe on the quantized grid.) Each cosine then scales
  // to an integer (×10⁴) before the top-8 sum, so mean/margin
  // divisions see identical integer operands too.
  //
  // Scale: same shape as q31 — the query sample broadcasts, the corpus
  // streams through ONE scan with a bounded-heap partial top-k per
  // partition; only k-row partials shuffle. No corpus-wide window.
  val q173 = q("q173_knn_margin",
    """WITH c AS (SELECT vec_id,
      |        list_transform(CAST(embedding AS DOUBLE[]),
      |                       x -> round(x * 1000)) AS v
      |      FROM embeddings),
      |q AS (SELECT vec_id AS qid, v AS qv FROM c WHERE vec_id % 40 = 0),
      |p AS (SELECT qid, vec_id AS cid,
      |        list_sum(list_transform(range(1, len(qv) + 1),
      |                 i -> qv[i] * v[i])) AS dt,
      |        list_sum(list_transform(qv, x -> x * x)) AS na,
      |        list_sum(list_transform(v, x -> x * x)) AS nb
      |      FROM q CROSS JOIN c WHERE vec_id <> qid),
      |s AS (SELECT qid, cid,
      |        CAST(round(dt / sqrt(na * nb) * 10000) AS BIGINT) AS cos_l
      |      FROM p),
      |r AS (SELECT qid, cid, cos_l,
      |        row_number() OVER (PARTITION BY qid
      |                           ORDER BY cos_l DESC, cid) AS rk
      |      FROM s),
      |g AS (SELECT qid,
      |        MAX(CASE WHEN rk = 1 THEN cid END) AS best_cid,
      |        MAX(CASE WHEN rk = 1 THEN cos_l END) AS best_l,
      |        CAST(SUM(cos_l) AS BIGINT) AS sum_l,
      |        CAST(COUNT(*) AS BIGINT) AS k
      |      FROM r WHERE rk <= 8 GROUP BY qid),
      |m AS (SELECT qid, best_cid, best_l, sum_l, k,
      |        CASE WHEN sum_l > 0 THEN
      |          CAST(round(CAST(best_l AS DOUBLE) * k * 10000 / sum_l) AS BIGINT)
      |        END AS margin_l
      |      FROM g)
      |SELECT qid, best_cid,
      |  CAST(best_l AS DOUBLE) / 10000 AS best_cos,
      |  CAST(sum_l AS DOUBLE) / k / 10000 AS mean_cos,
      |  CAST(margin_l AS DOUBLE) / 10000.0 AS margin,
      |  (sum_l > 0 AND margin_l >= 10500) AS confident
      |FROM m ORDER BY qid""".stripMargin) { (s, dir) =>
    import graft.functions.VectorFunctions.cosineSim
    // Quantize to the SQ grid at the scan (map-side, once per vector);
    // the native cosine kernel then runs on exact integer-valued
    // doubles, so its dot/√(na·nb) matches the oracle bit-for-bit.
    val c = Similarity.corpus(s, dir)
      .select(col("vec_id"), transform(col("v"), x => round(x * 1000)).as("v"))
    val qs = c.where(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = c.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(cosineSim(col("qv"), col("v")) * 10000).cast(LongType).as("cos_l"))
    // Bounded-heap top-8 on the INTEGER score (cos_l DESC, cid ASC) —
    // identical order to the oracle's row_number. The heap key is the
    // scaled long re-read as double: exact for |cos_l| ≤ 2^53, so the
    // ordering is the integer ordering.
    scored.groupBy("qid")
      .agg(graft.functions.TopK.topKDouble(8)(col("cid"), col("cos_l").cast(DoubleType))
        .as("top"))
      .select(col("qid"),
        element_at(col("top"), 1).getField("_1").as("best_cid"),
        element_at(col("top"), 1).getField("_2").cast(LongType).as("best_l"),
        aggregate(col("top"), lit(0L), (a, e) => a + e.getField("_2").cast(LongType))
          .as("sum_l"),
        size(col("top")).cast(LongType).as("k"))
      .select(col("qid"), col("best_cid"), col("best_l"), col("sum_l"), col("k"),
        // Scale-0 round in scaled-integer space: decimal halves at
        // scale 0 are exactly representable doubles, so Spark's
        // BigDecimal HALF_UP and DuckDB's half-away-from-zero agree on
        // identical operands. A round(x, 4) here would NOT be safe —
        // sum_l/k/10⁴ lands on non-representable decimal halves
        // (sum_l ≡ k/2 mod k) where the two engines' rounding reads
        // diverge; mean_cos therefore ships the raw identical-op
        // quotient unrounded.
        // sum_l > 0 guard: cosines can be NEGATIVE, so a neighborhood
        // whose top-8 sums to ≤ 0 would otherwise divide into
        // ±Infinity and round(Inf).cast(Long) diverges between
        // engines — such queries get null margin / confident = false.
        when(col("sum_l") > 0,
          round(col("best_l").cast(DoubleType) * col("k") * 10000 / col("sum_l"))
            .cast(LongType)).as("margin_l"))
      .select(col("qid"), col("best_cid"),
        (col("best_l").cast(DoubleType) / 10000).as("best_cos"),
        (col("sum_l").cast(DoubleType) / col("k") / 10000).as("mean_cos"),
        (col("margin_l").cast(DoubleType) / 10000.0).as("margin"),
        ((col("sum_l") > 0) && (col("margin_l") >= 10500)).as("confident"))
      .orderBy("qid")
  }

  val all: Seq[GraftQuery] = Seq(q170, q171, q172, q173)
}
