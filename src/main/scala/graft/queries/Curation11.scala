package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eleventh curation batch: web-frontier hygiene — the URL-level
  * dedup every crawl pipeline runs BEFORE fetching or content-hashing
  * anything (a frontier that treats `http://x/p`, `HTTPS://www.x/p/`,
  * and `x/p?utm_source=feed#top` as distinct re-fetches the same page
  * four times and quadruple-counts it downstream).
  */
object Curation11 {

  private def q(name: String, oracle: String)(f: (SparkSession, String) => DataFrame) =
    GraftQuery(name, f, Some(oracle))

  /** Crawl-frontier URL canonicalization as a regexp chain shared
    * verbatim with the oracle (the q120 RE2 ∩ java.util.regex common
    * dialect): case-insensitively strip the scheme and a leading
    * `www.`, drop the fragment, drop `utm_*` tracking parameters, drop
    * a trailing slash. utm stripping is three passes so a tracking
    * param FIRST in the query string never eats the `?` of a surviving
    * param: `&utm_x=v` terms drop anywhere, then a leading
    * `?utm_x=v&rest` promotes `rest` to `?rest`, then a query that was
    * only utm drops entirely ('x.com/p?utm_a=1&id=7' → 'x.com/p?id=7',
    * not the malformed 'x.com/p&id=7' a single `[?&]utm...` pass
    * produces). A full canonicalizer also lower-cases the authority and
    * split-sorts surviving query parameters; the corpus construction
    * below keeps hosts lowercase, so the regex chain IS the full rule
    * for this shape (and stays expressible identically in both
    * engines, which is what makes the census hash-comparable —
    * StreamingFrontier runs the same kernel on live URLs). */
  def canonUrlExpr(c: Column): Column = {
    val noScheme = regexp_replace(c, "^(?i)https?://(www\\.)?", "")
    val noFrag = regexp_replace(noScheme, "#.*$", "")
    val noAmpUtm = regexp_replace(noFrag, "&utm_[a-z]+=[^&#]*", "")
    val noLeadUtm = regexp_replace(noAmpUtm, "\\?utm_[a-z]+=[^&#]*&", "?")
    val noUtm = regexp_replace(noLeadUtm, "\\?utm_[a-z]+=[^&#]*$", "")
    regexp_replace(noUtm, "/$", "")
  }

  private def canonUrlSql(c: String): String =
    s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"regexp_replace(regexp_replace($c, " +
      "'^(?i)https?://(www\\.)?', '', 'g'), '#.*$', '', 'g'), " +
      "'&utm_[a-z]+=[^&#]*', '', 'g'), '\\?utm_[a-z]+=[^&#]*&', '?', 'g'), " +
      "'\\?utm_[a-z]+=[^&#]*$', '', 'g'), '/$', '', 'g')"

  // -- q169: canonical-URL dedup census ----------------------------------
  // The corpus has no URL column, so one is DERIVED deterministically in
  // both engines (the q120/q165 augmentation discipline): every document
  // gets a URL whose path groups doc_ids (mod 50) per source, dressed in
  // the real-world variation a frontier sees — scheme case + www
  // (doc_id%2), trailing slash (%3), utm tracking params (%4), fragment
  // (%5). Raw URLs differ per variant; the canonical form collapses each
  // (source, path) group. The census per source: how many frontier
  // entries, how many byte-distinct URLs, how many truly distinct pages,
  // how many groups the canonicalizer merged — the dedup factor a
  // frontier gains before a single fetch.
  //
  // Scale: the URL derive + canonicalization are per-row map-side
  // expressions in the scan stage; the shuffle carries (source, canon,
  // url) short strings — never text — into a two-level aggregate
  // (COUNT(DISTINCT url) stays inside the (source, canon) group, so
  // there is no corpus-wide distinct); output is |sources| rows.
  private val urlSql =
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://www.' ELSE 'http://' END) || source" +
      " || '.example.com/Articles/' || CAST(doc_id % 50 AS VARCHAR)" +
      " || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)" +
      " || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END)" +
      " || (CASE WHEN doc_id % 5 = 0 THEN '#sec-2' ELSE '' END)"
  val q169 = q("q169_url_canon_census",
    s"""WITH u AS (SELECT source, $urlSql AS url FROM documents),
      |c AS (SELECT source, url, ${canonUrlSql("url")} AS canon FROM u),
      |g AS (SELECT source, canon, COUNT(*) AS n,
      |        COUNT(DISTINCT url) AS n_raw FROM c GROUP BY 1, 2)
      |SELECT source,
      |  CAST(SUM(n) AS BIGINT) AS n_urls,
      |  CAST(SUM(n_raw) AS BIGINT) AS n_raw_distinct,
      |  CAST(COUNT(*) AS BIGINT) AS n_canon_distinct,
      |  CAST(SUM(CASE WHEN n_raw >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_merged_groups
      |FROM g GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir).documents.select(col("doc_id"), col("source"))
    val g = docs.select(col("source"), deriveUrl(col("doc_id"), col("source")).as("url"))
      .select(col("source"), col("url"), canonUrlExpr(col("url")).as("canon"))
      .groupBy("source", "canon")
      .agg(count(lit(1)).as("n"), countDistinct(col("url")).as("n_raw"))
    g.groupBy("source").agg(
        sum(col("n")).as("n_urls"),
        sum(col("n_raw")).as("n_raw_distinct"),
        count(lit(1)).as("n_canon_distinct"),
        sum(when(col("n_raw") >= 2, 1L).otherwise(0L)).as("n_merged_groups"))
      .orderBy("source")
  }

  /** q169's deterministic URL derivation — byte-identical to `urlSql`
    * (exposed so UrlCanonSpec can prove the canonicalizer's merge
    * properties on exactly the derived population). */
  def deriveUrl(docId: Column, source: Column): Column =
    concat(
      when(docId % 2 === 0, lit("HTTPS://www.")).otherwise(lit("http://")),
      source, lit(".example.com/Articles/"), (docId % 50).cast("string"),
      when(docId % 3 === 0, lit("/")).otherwise(lit("")),
      when(docId % 4 === 0,
        concat(lit("?utm_source=feed&utm_campaign=c"), (docId % 7).cast("string")))
        .otherwise(lit("")),
      when(docId % 5 === 0, lit("#sec-2")).otherwise(lit("")))

  val all: Seq[GraftQuery] = Seq(q169)
}
