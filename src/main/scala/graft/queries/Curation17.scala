package graft.queries

import graft.{GraftQuery, Tables}
import graft.QueryDsl.{crossHash60, crossHash60Sql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventeenth curation batch: the URL/domain-level source gate — the
  * one standard curation filter the registry still lacked (r14 VERDICT
  * #5). C4 drops documents from a badword blocklist, RefinedWeb §3.1
  * filters by URL against a curated blocklist of domains with an
  * allowlist override; the operator here is that gate's census:
  * registered-domain extraction over the q169-derived URLs, a
  * deterministic hash-derived block/allow list (the derived-corpus
  * discipline — the corpus ships no real blocklist, so membership is a
  * closed-form function both engines compute identically), and the
  * per-source blocked/allowlisted/kept bill a release review reads.
  *
  * Registered-domain extraction is the public-suffix rule reduced to
  * the fixture's suffix set: hosts end in a single-label suffix
  * (.com/.org/.net → registrable = last 2 labels) or the multi-label
  * `.co.uk` (registrable = last 3 labels) — the exact distinction a
  * real PSL lookup makes, expressed as one anchored regex shared
  * VERBATIM between Spark (java.util.regex) and DuckDB (RE2), per the
  * q120/q169 common-dialect discipline. A full implementation swaps
  * the two-alternative regex for the PSL table broadcast as a map-side
  * lookup; the plan shape is unchanged.
  *
  * Scale: URL derive + canonicalize + host/domain extract + hash-list
  * membership are all per-row map-side expressions in the scan stage;
  * the shuffle ships (source, regdom, verdict) short strings into one
  * aggregate; output is |sources| rows. No broadcast needed because
  * the lists are closed-form — with a real PSL/blocklist both are
  * small dimension tables that BROADCAST (never shuffle the corpus).
  */
object Curation17 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  // -- q195: domain blocklist/allowlist gate census -----------------------
  // URL fixture: richer hosts than q169's (83 registrable names x 4
  // suffixes incl. co.uk, cdn./blog. subdomains) so registered-domain
  // extraction has real work; the q169 canonicalizer chain strips
  // scheme/www/utm/fragment first. List membership is hash-derived
  // with salted keys: block:<regdom> (~20% of domains), allow:<regdom>
  // (~14% override) — the allowlist WINS, the C4/RefinedWeb posture.

  /** The derived raw URL: q169's variation dressing over a host with
    * subdomain + 83 names + 4 public suffixes. */
  private[graft] def deriveUrl(docId: Column, source: Column): Column =
    concat(
      when(docId % 2 === 0, lit("HTTPS://www.")).otherwise(lit("http://")),
      when(docId % 6 === 0, lit("cdn.")).otherwise(
        when(docId % 6 === 1, lit("blog.")).otherwise(lit(""))),
      lit("host"), (docId % 83).cast("string"), lit("."),
      when(docId % 7 === 0, lit("co.uk")).otherwise(
        when(docId % 7 === 1, lit("org")).otherwise(
          when(docId % 7 === 2, lit("net")).otherwise(lit("com")))),
      lit("/"), source, lit("/p"), (docId % 29).cast("string"),
      when(docId % 4 === 0, lit("?utm_source=feed")).otherwise(lit("")),
      when(docId % 5 === 0, lit("#frag")).otherwise(lit("")))

  private val urlSql =
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://www.' ELSE 'http://' END)" +
      " || (CASE WHEN doc_id % 6 = 0 THEN 'cdn.' WHEN doc_id % 6 = 1 THEN 'blog.' ELSE '' END)" +
      " || 'host' || CAST(doc_id % 83 AS VARCHAR) || '.'" +
      " || (CASE WHEN doc_id % 7 = 0 THEN 'co.uk' WHEN doc_id % 7 = 1 THEN 'org'" +
      "          WHEN doc_id % 7 = 2 THEN 'net' ELSE 'com' END)" +
      " || '/' || source || '/p' || CAST(doc_id % 29 AS VARCHAR)" +
      " || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed' ELSE '' END)" +
      " || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"

  /** Registrable-domain regex (see class doc): the co.uk alternative
    * must come first so the multi-label suffix claims 3 labels. */
  private val RegDomRe = "([^.]+\\.co\\.uk|[^.]+\\.[^.]+)$"
  private val HostRe = "^[^/]+"

  /** Registered domain of a canonical URL — host (everything before
    * the first `/`) reduced to its registrable suffix-plus-one. */
  private[graft] def registeredDomain(canonUrl: Column): Column =
    regexp_extract(regexp_extract(canonUrl, HostRe, 0), RegDomRe, 1)

  /** Hash-derived list membership, salted per list so block and allow
    * draws are independent. */
  private[graft] def inBlocklist(regdom: Column): Column =
    crossHash60(concat(lit("block:"), regdom)) % 5 === 0
  private[graft] def inAllowlist(regdom: Column): Column =
    crossHash60(concat(lit("allow:"), regdom)) % 7 === 0

  val q195 = q("q195_domain_blocklist",
    s"""WITH u AS (SELECT doc_id, source, $urlSql AS url FROM documents),
      |c AS (SELECT doc_id, source,
      |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |          regexp_replace(regexp_replace(url,
      |          '^(?i)https?://(www\\.)?', '', 'g'), '#.*$$', '', 'g'),
      |          '&utm_[a-z]+=[^&#]*', '', 'g'), '\\?utm_[a-z]+=[^&#]*&', '?', 'g'),
      |          '\\?utm_[a-z]+=[^&#]*$$', '', 'g'), '/$$', '', 'g') AS canon
      |      FROM u),
      |d AS (SELECT doc_id, source,
      |        regexp_extract(regexp_extract(canon, '$HostRe', 0), '$RegDomRe', 1)
      |          AS regdom
      |      FROM c),
      |v AS (SELECT source, regdom,
      |        (${crossHash60Sql("'block:' || regdom")} % 5 = 0) AS blocked,
      |        (${crossHash60Sql("'allow:' || regdom")} % 7 = 0) AS allowed
      |      FROM d)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN blocked AND NOT allowed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_blocked_docs,
      |  CAST(SUM(CASE WHEN blocked AND allowed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_allowlisted_docs,
      |  CAST(SUM(CASE WHEN NOT blocked OR allowed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept_docs,
      |  CAST(COUNT(DISTINCT CASE WHEN blocked AND NOT allowed THEN regdom END)
      |    AS BIGINT) AS n_blocked_domains
      |FROM v GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents.select(col("doc_id"), col("source"))
    val v = docs
      .select(col("source"),
        registeredDomain(Curation11.canonUrlExpr(
          deriveUrl(col("doc_id"), col("source")))).as("regdom"))
      .select(col("source"), col("regdom"),
        inBlocklist(col("regdom")).as("blocked"),
        inAllowlist(col("regdom")).as("allowed"))
    v.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("blocked") && !col("allowed"), 1L).otherwise(0L))
          .as("n_blocked_docs"),
        sum(when(col("blocked") && col("allowed"), 1L).otherwise(0L))
          .as("n_allowlisted_docs"),
        sum(when(!col("blocked") || col("allowed"), 1L).otherwise(0L))
          .as("n_kept_docs"),
        countDistinct(when(col("blocked") && !col("allowed"), col("regdom")))
          .as("n_blocked_domains"))
      .orderBy("source")
  }

  val all: Seq[GraftQuery] = Seq(q195)
}
