package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl.crossHash60
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Fifteenth curation batch: exact-substring deduplication at suffix
  * grain (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better", §4.1 ExactSubstr) — the standard release-stage pass
  * that removes any ≥50-token substring occurring more than once in
  * the corpus. q78/q167 purge at shingle/winnow SPAN grain, which
  * over-approximates the removed set; this is the exact operator.
  *
  * The reduction that makes it distributed WITHOUT a suffix array or a
  * corpus×corpus join: a substring of length m ≥ L shared between two
  * occurrences contains exactly (m − L + 1) aligned L-token windows,
  * each of which is itself a duplicated substring — and conversely a
  * duplicated L-gram IS a duplicated ≥L-token substring. So the token
  * set covered by "some shared substring of ≥ L tokens" EQUALS the
  * token set covered by "some L-gram occurring ≥ 2 times in the
  * corpus", and the maximal removed spans are the merged unions of the
  * covered L-windows. The suffix-array pass of the paper computes the
  * same set; the L-gram census is its shuffle-friendly equivalent.
  *
  * Scale shape: ONE token-grain explode (each position ships a single
  * 60-bit gram hash — the gram string exists only transiently inside
  * the projection lambda, never in a row); the census is
  * vocabulary-grain; covered positions come back via a hash equi-join;
  * the interval merge is a window over (doc, pos) where only COVERED
  * positions shuffle (duplicated-text grain, orders below the corpus);
  * the report is a source-keyed aggregate. No pair space anywhere —
  * two documents sharing a span never meet in a join.
  */
object Curation15 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  /** The paper's threshold: 50 BPE tokens (§4.1); whitespace tokens
    * here. Duplicated runs shorter than this are overwhelmingly
    * idiomatic English rather than copied text. */
  val MinDupTokens = 50

  // -- q183: exact-substring dedup census (Lee et al. 2022 §4.1) --------
  // Per source: how many documents carry a ≥50-token substring that
  // occurs elsewhere in the corpus (including twice in the same
  // document — the paper's "more than once in total" rule), how many
  // tokens the release-stage purge would remove, and in how many
  // maximal spans. The interval merge is the same windowed cummax in
  // both engines: a position starts a new span iff it clears the
  // running max coverage end by more than one token (adjacent windows
  // fuse — spans are maximal runs of covered tokens), and contributes
  // (pos + L − 1) − max(prior_end, pos − 1) newly covered tokens.
  val q183 = q("q183_exact_substring",
    s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |g AS (SELECT doc_id, s.pos AS pos, s.gh AS gh
      |      FROM (SELECT doc_id, unnest(list_transform(range(1, len(t) - $MinDupTokens + 2),
      |               i -> {'pos': i, 'gh': CAST(concat('0x', substr(md5(
      |                      list_aggregate(t[i:i+$MinDupTokens-1], 'string_agg', ' ')), 1, 15)) AS BIGINT)})) AS s
      |            FROM d WHERE len(t) >= $MinDupTokens)),
      |c AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
      |cov AS (SELECT g.doc_id, g.pos,
      |          max(g.pos + $MinDupTokens - 1) OVER (PARTITION BY g.doc_id ORDER BY g.pos
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_end
      |        FROM g JOIN c USING (gh)),
      |sp AS (SELECT doc_id,
      |         greatest(0, pos + $MinDupTokens - 1
      |                     - greatest(coalesce(prior_end, pos - 1), pos - 1)) AS added,
      |         CASE WHEN prior_end IS NULL OR pos > prior_end + 1 THEN 1 ELSE 0 END AS ns
      |       FROM cov),
      |per AS (SELECT doc_id, CAST(SUM(added) AS BIGINT) AS dup_tokens,
      |          CAST(SUM(ns) AS BIGINT) AS n_spans
      |        FROM sp GROUP BY doc_id)
      |SELECT d.source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN per.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_affected,
      |  CAST(SUM(len(d.t)) AS BIGINT) AS total_tokens,
      |  CAST(COALESCE(SUM(per.dup_tokens), 0) AS BIGINT) AS dup_tokens,
      |  CAST(COALESCE(SUM(per.n_spans), 0) AS BIGINT) AS n_spans,
      |  CAST(round(CAST(COALESCE(SUM(per.dup_tokens), 0) AS DOUBLE) * 10000
      |       / SUM(len(d.t))) AS BIGINT) / 10000.0 AS dup_rate
      |FROM d LEFT JOIN per ON d.doc_id = per.doc_id
      |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, dir) =>
    exactSubstringCensus(Tables(s, dir).documents, MinDupTokens)
  }

  /** The census over any (doc_id, source, text) frame — separated so
    * specs can replay planted corpora through it at small L. */
  private[graft] def exactSubstringCensus(docs: DataFrame, L: Int): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
    // one row per token position: (doc, pos, 60-bit hash of the L-gram
    // starting there); the gram string is transient inside the lambda
    // codegen kernel twin of the per-position L-gram HOF
    //   when(size >= L, transform(sequence(0, n-L),
    //     i => crossHash60(concat_ws(" ", slice(t, i+1, L))))).otherwise(array())
    // — the kernel returns an empty array below L tokens (and a null `t`
    // nulls through to zero posexplode rows, exactly like the otherwise
    // branch), so the guard folds into the kernel; the interpreted
    // Sequence/ArrayTransform/Slice tree ran per document
    // (ShingleKernelParitySpec pins kernel == HOF)
    val g = d.select(col("doc_id"),
        posexplode(graft.functions.expr.DedupExpressions.crossGramsK(col("t"), L)))
      .select(col("doc_id"), col("pos"), col("col").as("gh"))
    // vocabulary-grain census: a gram occurring ≥2 times anywhere (same
    // doc counts) marks every occurrence's window as duplicated text
    val dup = g.groupBy("gh").agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2).select("gh")
    val covered = g.join(dup, Seq("gh")).select(col("doc_id"), col("pos"))
    // interval merge over covered positions only: cummax of prior
    // window ends; a gap of >1 token starts a new maximal span
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val priorEnd = max(col("pos") + (L - 1)).over(w)
    val per = covered
      .select(col("doc_id"), col("pos"), priorEnd.as("prior_end"))
      .select(col("doc_id"),
        greatest(lit(0), col("pos") + (L - 1) -
          greatest(coalesce(col("prior_end"), col("pos") - 1), col("pos") - 1)).as("added"),
        when(col("prior_end").isNull || col("pos") > col("prior_end") + 1, 1L)
          .otherwise(0L).as("ns"))
      .groupBy("doc_id")
      .agg(sum(col("added")).cast(LongType).as("dup_tokens"),
        sum(col("ns")).cast(LongType).as("n_spans"))
    // token counts project map-side BEFORE the join — the corpus's
    // token arrays must never ride the doc-keyed exchange (per is
    // duplicated-doc grain, orders smaller; stats pick broadcast)
    val docStats = d.select(col("doc_id"), col("source"),
      size(col("t")).cast(LongType).as("n_toks"))
    docStats.join(per, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dup_tokens").isNotNull, 1L).otherwise(0L)).as("n_affected"),
        sum(col("n_toks")).as("total_tokens"),
        coalesce(sum(col("dup_tokens")), lit(0L)).as("dup_tokens"),
        coalesce(sum(col("n_spans")), lit(0L)).as("n_spans"))
      .select(col("source"), col("n_docs"), col("n_affected"),
        col("total_tokens"), col("dup_tokens"), col("n_spans"),
        (round(col("dup_tokens").cast(DoubleType) * 10000 / col("total_tokens"))
          .cast(LongType) / 10000.0).as("dup_rate"))
      .orderBy("source")
  }

  // -- q184: PII scrub census (emails / phones / IPs) --------------------
  // The release-stage redaction pass every public-corpus pipeline runs
  // (Dolma's PII tagger, RedPajama's scrubbers): detect and mask
  // email / phone / IPv4 literals, and report per source how many
  // documents carry PII, how many literals of each class, and how many
  // characters redaction removes. The synthetic corpus carries no PII,
  // so — the q181 derived-corpus discipline — deterministic literals
  // are injected keyed on doc_id (7→email, 11→phone, 13→IP, overlaps
  // compose) identically in both engines; the DETECTORS then run on
  // the derived text with no knowledge of the injection rule.
  //
  // Counts are measured on the original text; redaction applies the
  // three masks in a fixed order (email, phone, IP) so chars_redacted
  // is well-defined even if a future pattern overlaps another's match.
  // Regexes stay inside the Java-regex ∩ RE2 common subset (character
  // classes, bounded repeats — no lookaround/backrefs), and DuckDB's
  // regexp_replace carries the 'g' flag to match Spark's replace-all.
  //
  // Scale: pure map-side per-row work on ONE corpus scan (Spark's
  // native codegen'd RegExpCount/RegExpReplace), then a source-keyed
  // partial aggregate. No shuffle beyond the final group-by.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  private val IpRe    = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  val q184 = q("q184_pii_scrub",
    s"""WITH d AS (SELECT doc_id, source,
      |        text
      |          || CASE WHEN doc_id % 7 = 0
      |               THEN ' contact user' || doc_id || '@example.com' ELSE '' END
      |          || CASE WHEN doc_id % 11 = 0
      |               THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      |          || CASE WHEN doc_id % 13 = 0
      |               THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
      |                    || CAST((doc_id // 256) % 256 AS VARCHAR) || '.'
      |                    || CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS content
      |      FROM documents),
      |m AS (SELECT doc_id, source,
      |        CAST(len(regexp_extract_all(content, '$EmailRe')) AS BIGINT) AS n_email,
      |        CAST(len(regexp_extract_all(content, '$PhoneRe')) AS BIGINT) AS n_phone,
      |        CAST(len(regexp_extract_all(content, '$IpRe')) AS BIGINT) AS n_ip,
      |        CAST(len(content) AS BIGINT)
      |          - CAST(len(regexp_replace(regexp_replace(regexp_replace(content,
      |              '$EmailRe', '<EMAIL>', 'g'),
      |              '$PhoneRe', '<PHONE>', 'g'),
      |              '$IpRe', '<IP>', 'g')) AS BIGINT) AS chars_cut
      |      FROM d)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_pii,
      |  CAST(SUM(n_email) AS BIGINT) AS n_emails,
      |  CAST(SUM(n_phone) AS BIGINT) AS n_phones,
      |  CAST(SUM(n_ip) AS BIGINT) AS n_ips,
      |  CAST(SUM(chars_cut) AS BIGINT) AS chars_redacted
      |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val d = Tables(s, dir).documents.select(col("doc_id"), col("source"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(""),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(""),
        when(col("doc_id") % 13 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"), lit("."),
            (expr("doc_id div 256") % 256).cast("string"), lit("."),
            (col("doc_id") % 100).cast("string")))
          .otherwise("")).as("content"))
    val m = d.select(col("source"),
      regexp_count(col("content"), lit(EmailRe)).cast(LongType).as("n_email"),
      regexp_count(col("content"), lit(PhoneRe)).cast(LongType).as("n_phone"),
      regexp_count(col("content"), lit(IpRe)).cast(LongType).as("n_ip"),
      (length(col("content")) -
        length(regexp_replace(regexp_replace(regexp_replace(col("content"),
          EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), IpRe, "<IP>")))
        .cast(LongType).as("chars_cut"))
    m.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_email") + col("n_phone") + col("n_ip") > 0, 1L)
          .otherwise(0L)).as("n_docs_pii"),
        sum(col("n_email")).as("n_emails"),
        sum(col("n_phone")).as("n_phones"),
        sum(col("n_ip")).as("n_ips"),
        sum(col("chars_cut")).as("chars_redacted"))
      .orderBy("source")
  }

  val all: Seq[GraftQuery] = Seq(q183, q184)
}
