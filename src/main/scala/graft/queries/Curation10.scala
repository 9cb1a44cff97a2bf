package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tenth curation batch: corpus hygiene across *versions* of the corpus —
  * the normalization-robust exact-dedup layer every web pipeline runs
  * between byte-identical dedup (q27) and MinHash (q29), and the
  * crawl-to-crawl snapshot reconciliation that tells the pipeline what
  * actually changed since the last ingest (the number incremental
  * passes like q114/q124/q143/q158 consume).
  */
object Curation10 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  /** Case/punctuation/whitespace-fold: lower → non-[a-z0-9 ] to space →
    * collapse runs → trim. The CCNet/Dolma "fuzzy-exact" canonical form:
    * cheap enough to run map-side over every document, strong enough to
    * merge the re-encodes and boilerplate re-rendered copies that
    * byte-level md5 (q27) treats as distinct. The oracle runs the
    * three-regex chain (`lower` → `[^a-z0-9 ]`→' ' → collapse → trim,
    * RE2 ∩ java.util.regex common dialect per the q120 discipline); the
    * Spark side runs the single-pass native kernel, proven equal to the
    * chain on adversarial inputs by NormalizeFoldSpec — one codegen'd
    * char walk instead of three compiled-regex passes per row. */
  def normExpr(c: Column): Column =
    graft.functions.expr.TextExpressions.normText(c)

  /** The regex-chain twin of [[normExpr]] — the oracle's formulation,
    * kept as the executable spec the kernel is gated against. */
  def normRegexExpr(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))
  private def normSqlOn(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
  private val normSql = normSqlOn("text")

  /** Unicode-aware canonical fold (q168's normalization): NFKC + full
    * case fold + diacritic strip + letter/digit walk — see
    * [[graft.functions.expr.TextKernels.unicodeFold]]. Reduces exactly
    * to [[normExpr]] on ASCII input (the fast path IS the ASCII
    * kernel), which is what lets q168's oracle reason about the fold
    * through the ASCII regex chain on the canonical source text. */
  def unicodeNormExpr(c: Column): Column =
    graft.functions.expr.TextExpressions.normUnicode(c)

  // -- q165: normalization-robust dedup census ---------------------------
  // The corpus is deterministically "dirtied" first (every doc_id % 3 = 0
  // document contributes a second copy with flipped case, injected
  // punctuation, and padding whitespace — the q120 augmentation
  // precedent, since the synthetic corpus is already clean lowercase):
  // raw md5 dedup is blind to those copies; the normalized fingerprint
  // merges them. The census quantifies the gap per source — how many
  // "distinct" documents are really the same text wearing different
  // bytes.
  //
  // Scale: both fingerprints are computed MAP-SIDE in one corpus pass
  // (the shuffle carries (source, 2×32-char fp), never text), and the
  // distinct counts come from a two-level aggregate chain — group by
  // (source, raw_fp, norm_fp), then (source, norm_fp), then source — so
  // there is no Expand doubling (the q157 discipline; raw_fp determines
  // norm_fp, so counting g-rows IS counting distinct raws). Report is
  // |sources| rows.
  val q165 = q("q165_normalized_dedup",
    s"""WITH dirty AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, source, '  ' || upper(text) || ' !! '
      |  FROM documents WHERE doc_id % 3 = 0),
      |f AS (SELECT source, md5(text) AS raw_fp, md5($normSql) AS norm_fp FROM dirty),
      |g AS (SELECT source, raw_fp, norm_fp, COUNT(*) AS n FROM f GROUP BY 1, 2, 3),
      |g2 AS (SELECT source, norm_fp, SUM(n) AS n_docs_grp,
      |         COUNT(*) AS n_raw_variants
      |       FROM g GROUP BY 1, 2)
      |SELECT source,
      |  CAST(SUM(n_docs_grp) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_raw_variants) AS BIGINT) AS n_raw_distinct,
      |  CAST(COUNT(*) AS BIGINT) AS n_norm_distinct,
      |  CAST(SUM(CASE WHEN n_raw_variants >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_merged_groups
      |FROM g2 GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    // Two columnar scans (base ∪ filtered-mangled), NOT a single-scan
    // array-explode: the explode variant materializes every document's
    // text into an in-row array (copied on build and again on explode)
    // and measured 2.4x SLOWER at sf0.1 (1.7 s vs 0.7 s, warm family
    // context) — a pruned parquet re-scan is cheaper than copying the
    // corpus through ArrayData. The second scan reads 3 columns with
    // the %3 filter applied at the batch level; at 100 TB both scans
    // parallelize freely while the array copy would ride every row.
    val docs0 = Tables(s, dir).documents.select(col("doc_id"), col("source"), col("text"))
    val mangled = docs0.where(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id"), col("source"),
        concat(lit("  "), upper(col("text")), lit(" !! ")).as("text"))
    dedupCensusOf(docs0.union(mangled), normExpr)
  }

  /** The q165 census over any dirtied (source, text) relation: map-side
    * raw + normalized fingerprints (the shuffle carries (source,
    * 2×32-char fp), never text), two-level aggregate with no Expand
    * doubling, |sources| output rows. Shared by q165 (ASCII fold) and
    * q168 (Unicode fold) — same census, different kernel. */
  def dedupCensusOf(dirty: DataFrame, norm: Column => Column): DataFrame = {
    val g = dirty
      .select(col("source"), md5(col("text")).as("raw_fp"),
        md5(norm(col("text"))).as("norm_fp"))
      .groupBy("source", "raw_fp", "norm_fp").agg(count(lit(1)).as("n"))
    val g2 = g.groupBy("source", "norm_fp")
      .agg(sum(col("n")).as("n_docs_grp"), count(lit(1)).as("n_raw_variants"))
    g2.groupBy("source").agg(
        sum(col("n_docs_grp")).as("n_docs"),
        sum(col("n_raw_variants")).as("n_raw_distinct"),
        count(lit(1)).as("n_norm_distinct"),
        sum(when(col("n_raw_variants") >= 2, 1L).otherwise(0L)).as("n_merged_groups"))
      .orderBy("source")
  }

  // -- q166: corpus snapshot diff (crawl-to-crawl reconciliation) --------
  // Two corpus versions are derived deterministically from the one
  // stored table (snapshot A drops doc_id % 10 = 7 — "not crawled yet";
  // snapshot B drops % 10 = 3 — "gone from the web" — and re-renders
  // every % 4 = 1 page with a ' v2' suffix), then reconciled: every
  // document is added, removed, changed, or unchanged, and the census
  // reports the per-source churn — the number that sizes the
  // incremental passes (q114's delta, q143's delta scan, q158's delta
  // edges) and decides whether an incremental refresh beats a rebuild.
  //
  // Scale: each snapshot projects to (doc_id, source, md5) BEFORE the
  // join — content hashing is map-side in the scan stage, and since r17
  // both snapshots read the DOC_ID-BUCKETED corpus
  // ([[graft.sources.BucketedCorpus]]), so the full-outer equi-join
  // plans with NO exchange under either child (BucketedJoinSpec gates
  // it): reconciliation re-runs — the recurring crawl-to-crawl job this
  // models — never re-shuffle the corpus on doc_id at all. The verdict
  // aggregate is partial+final onto |sources| rows. Presence is the
  // join side's null-ness, not the fingerprint's, so a null-text
  // document still diffs correctly.
  val q166 = q("q166_snapshot_diff",
    """WITH snap_a AS (
      |  SELECT doc_id, source, md5(text) AS fp_a, 1 AS in_a
      |  FROM documents WHERE doc_id % 10 <> 7),
      |snap_b AS (
      |  SELECT doc_id, source,
      |    md5(CASE WHEN doc_id % 4 = 1 THEN text || ' v2' ELSE text END) AS fp_b,
      |    1 AS in_b
      |  FROM documents WHERE doc_id % 10 <> 3)
      |SELECT COALESCE(snap_b.source, snap_a.source) AS source,
      |  CAST(SUM(CASE WHEN in_a IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(SUM(CASE WHEN in_b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 AND fp_a IS DISTINCT FROM fp_b
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 AND fp_a IS NOT DISTINCT FROM fp_b
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
      |FROM snap_a FULL OUTER JOIN snap_b USING (doc_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val d = graft.sources.BucketedCorpus.documents(s, dir)
    val snapA = d.where(pmod(col("doc_id"), lit(10)) =!= 7)
      .select(col("doc_id"), col("source").as("source_a"),
        md5(col("text")).as("fp_a"), lit(1).as("in_a"))
    val snapB = d.where(pmod(col("doc_id"), lit(10)) =!= 3)
      .select(col("doc_id"), col("source").as("source_b"),
        md5(when(pmod(col("doc_id"), lit(4)) === 1, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("fp_b"), lit(1).as("in_b"))
    snapA.join(snapB, Seq("doc_id"), "full_outer")
      .groupBy(coalesce(col("source_b"), col("source_a")).as("source"))
      .agg(
        sum(when(col("in_a").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("in_b").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("in_a") === 1 && col("in_b") === 1 &&
          !(col("fp_a") <=> col("fp_b")), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("fp_a") <=> col("fp_b") &&
          col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L)).as("n_unchanged"))
      .orderBy("source")
  }

  // -- q167: exact-substring purge (Lee et al. removal pass) -------------
  // q78 computes the cross-doc duplicated-span SIGNAL; this is the
  // REMOVAL pass built on it (Lee et al. 2022, "Deduplicating Training
  // Data Makes Language Models Better"): every 8-token span seen in ≥2
  // distinct documents survives only in its first document (min doc_id
  // — q78's keeper rule); in every other document the tokens covered by
  // any occurrence of a duplicated span are cut, and the document is
  // reassembled from the surviving tokens. Output is the per-doc purge
  // record: token counts before/after and the md5 of the cleaned text
  // (the fingerprint the next pipeline stage ingests).
  //
  // Scale: the duplicated-span relation is built with q78's two-level
  // aggregate (dedup (span, doc_id) map-side, then a plain count — no
  // count-distinct Expand) and joined back to the span stream as a
  // hash-partitioned EQUI-join on the span — never broadcast: at web
  // scale the boilerplate-span table is itself huge. Coverage expansion
  // is a bounded 8-element explode off the result-sized hit relation,
  // deduped on (doc_id, p); reassembly is one doc-keyed exchange with
  // in-row sort (the q113 pattern). The span stream is exploded twice
  // (agg path + join path) — map-side work off the columnar scan,
  // cheaper at scale than persisting a corpus×len intermediate.
  val q167 = q("q167_span_purge",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tok AS (SELECT doc_id, CAST(unnest(range(0, len(t))) AS BIGINT) AS p,
      |          unnest(t) AS w
      |        FROM d),
      |sp AS (SELECT doc_id, CAST(unnest(range(0, len(t) - 7)) AS BIGINT) AS pos,
      |         unnest(list_transform(range(1, len(t) - 6),
      |                i -> list_aggregate(t[i:i+7], 'string_agg', ' '))) AS span
      |       FROM d WHERE len(t) >= 8),
      |dup AS (SELECT span, min(doc_id) AS first_doc
      |        FROM (SELECT DISTINCT span, doc_id FROM sp)
      |        GROUP BY span HAVING COUNT(*) >= 2),
      |hits AS (SELECT sp.doc_id, sp.pos FROM sp JOIN dup USING (span)
      |         WHERE sp.doc_id <> dup.first_doc),
      |cov AS (SELECT DISTINCT doc_id, pos + CAST(unnest(range(0, 8)) AS BIGINT) AS p
      |        FROM hits),
      |k AS (SELECT tok.doc_id, tok.p, tok.w, cov.p IS NOT NULL AS rm
      |      FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  md5(COALESCE(string_agg(CASE WHEN NOT rm THEN w END, ' ' ORDER BY p), ''))
      |    AS fp_clean
      |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    spanPurgeOn(Tables(s, dir).documents.select(col("doc_id"), col("text")))
  }

  /** q167's purge over any (doc_id, text) relation — exposed so specs
    * can drive it with generated corpora (the allPairsJaccardOn
    * pattern). */
  def spanPurgeOn(docs: DataFrame): DataFrame = {
    val d = docs.withColumn("_t", split(col("text"), " "))
    val t = col("_t")
    val spansArr = graft.functions.expr.TextExpressions.spanJoin(t, 8)
    def sp = d.where(size(t) >= 8)
      .select(col("doc_id"), posexplode(spansArr).as(Seq("pos", "span")))
    val dup = sp
      .groupBy("span", "doc_id").agg(lit(1))
      .groupBy("span")
      .agg(min(col("doc_id")).as("first_doc"), count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= 2)
      .select(col("span"), col("first_doc"))
    val cov = sp.join(dup, Seq("span"))
      .where(col("doc_id") =!= col("first_doc"))
      .select(col("doc_id"),
        explode(sequence(col("pos").cast("long"), col("pos").cast("long") + 7)).as("p"))
      .distinct()
      .withColumn("rm", lit(true))
    d.select(col("doc_id"), posexplode(t).as(Seq("p", "w")))
      .withColumn("p", col("p").cast("long"))
      .join(cov, Seq("doc_id", "p"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("rm"), 1L).otherwise(0L)).as("n_removed"),
        md5(array_join(transform(
          array_sort(collect_list(when(!coalesce(col("rm"), lit(false)),
            struct(col("p"), col("w"))))),
          x => x.getField("w")), " ")).as("fp_clean"))
      .orderBy("doc_id")
  }

  // -- q168: Unicode-fold dedup census -----------------------------------
  // The q165 census riding the Unicode kernel over a Unicode-BEARING
  // corpus: every doc_id % 3 = 0 document contributes a second copy
  // mangled with real Unicode noise — uppercased with composed
  // diacritics injected (A→Á), fullwidth compatibility characters
  // (E→Ｅ), the fi ligature substituted for its ASCII digraph
  // (FI→ﬁ), and NBSP / em-dash / fullwidth-! padding. The ASCII fold
  // (q165) is blind to ALL of it — every mangle survives the
  // [^a-z0-9 ]→space wall as a distinct or destroyed token — while the
  // NFKC+casefold+diacritic-strip kernel folds each copy back onto its
  // source document exactly.
  //
  // Oracle design (the q120/q165 augmentation discipline): DuckDB has
  // no NFKC, so the oracle cannot run the Unicode fold itself. Instead
  // each dirty row carries its CANONICAL source text alongside the
  // mangled bytes: raw_fp hashes the mangled text (bit-identical
  // construction in both engines), norm_fp hashes the ASCII chain over
  // the canonical text — sound because unicodeFold(mangle(t)) ==
  // asciiFold(t) for ASCII t (every injected code point either folds
  // back or is erased; UnicodeFoldSpec proves the equivalence on the
  // real corpus). The Spark side computes norm_fp from the MANGLED
  // bytes through the real kernel, so any NFKC/casefold/mark-strip
  // defect inflates n_norm_distinct and hash-mismatches the census.
  //
  // Scale: identical plan to q165 — two pruned columnar scans (base ∪
  // filtered-mangled), map-side fingerprints, fp-only shuffle; the
  // Normalizer runs only on rows that actually carry non-ASCII bytes
  // (the kernel's ASCII pre-scan), i.e. only on the mangled third.
  private val mangleSql =
    "' ' || chr(160) || replace(replace(replace(upper(text), 'A', 'Á'), " +
      "'E', 'Ｅ'), 'FI', 'ﬁ') || '—！ '"
  val q168 = q("q168_unicode_fold_census",
    s"""WITH dirty AS (
      |  SELECT doc_id, source, text AS raw_text, text AS canon_src FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, source, $mangleSql AS raw_text, text AS canon_src
      |  FROM documents WHERE doc_id % 3 = 0),
      |f AS (SELECT source, md5(raw_text) AS raw_fp,
      |        md5(${normSqlOn("canon_src")}) AS norm_fp FROM dirty),
      |g AS (SELECT source, raw_fp, norm_fp, COUNT(*) AS n FROM f GROUP BY 1, 2, 3),
      |g2 AS (SELECT source, norm_fp, SUM(n) AS n_docs_grp,
      |         COUNT(*) AS n_raw_variants
      |       FROM g GROUP BY 1, 2)
      |SELECT source,
      |  CAST(SUM(n_docs_grp) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_raw_variants) AS BIGINT) AS n_raw_distinct,
      |  CAST(COUNT(*) AS BIGINT) AS n_norm_distinct,
      |  CAST(SUM(CASE WHEN n_raw_variants >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_merged_groups
      |FROM g2 GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val docs0 = Tables(s, dir).documents.select(col("doc_id"), col("source"), col("text"))
    dedupCensusOf(docs0.union(unicodeMangled(docs0)), unicodeNormExpr)
  }

  /** q168's deterministic Unicode dirtying — exposed so UnicodeFoldSpec
    * can prove the fold-equivalence premise the oracle rests on. Must
    * stay byte-identical to `mangleSql` (both feed md5). */
  def unicodeMangled(docs: DataFrame): DataFrame =
    docs.where(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id"), col("source"),
        concat(lit(" \u00A0"), // space + NBSP (chr(160) in the oracle)
          replace(replace(replace(upper(col("text")), lit("A"), lit("Á")),
            lit("E"), lit("Ｅ")), lit("FI"), lit("ﬁ")),
          lit("—！ ")).as("text"))

  val all: Seq[GraftQuery] = Seq(q165, q166, q167, q168)
}
