package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** q169's crawl-frontier URL canonicalizer: fixture pairs per rule,
  * idempotence, and the merge property on the derived population —
  * every variant of a (source, path) group collapses to one canonical
  * form, and different paths never collide. */
class UrlCanonSpec extends SparkSpecBase {
  import spark.implicits._

  private def canon(urls: Seq[String]): Seq[String] =
    urls.toDF("u").select(Curation11.canonUrlExpr(col("u"))).as[String].collect().toSeq

  test("canonicalization fixtures: scheme/www case, fragment, utm params, trailing slash") {
    val cases = Seq(
      "http://x.com/p" -> "x.com/p",
      "HTTPS://WWW.x.com/p" -> "x.com/p",
      "https://www.x.com/p/" -> "x.com/p",
      "x.com/p#top" -> "x.com/p",
      "x.com/p?utm_source=feed" -> "x.com/p",
      "x.com/p/?utm_source=a&utm_campaign=b#frag" -> "x.com/p",
      // non-tracking params survive (the canonicalizer only strips utm_*)
      "x.com/p?id=7" -> "x.com/p?id=7",
      "x.com/p?id=7&utm_medium=rss" -> "x.com/p?id=7",
      // a LEADING utm param must not eat the '?' of a surviving param
      // (the single-pass [?&]utm regex produced malformed 'x.com/p&id=7')
      "x.com/p?utm_source=feed&id=7" -> "x.com/p?id=7",
      "x.com/p?utm_a=1&utm_b=2&id=7" -> "x.com/p?id=7",
      "x.com/p?utm_a=1&utm_b=2" -> "x.com/p",
      // path case is significant (URL paths are case-sensitive)
      "http://x.com/Articles/P" -> "x.com/Articles/P")
    canon(cases.map(_._1)).zip(cases).foreach { case (got, (in, want)) =>
      assert(got == want, s"canon('$in') = '$got', want '$want'")
    }
  }

  test("idempotent: canonicalizing a canonical URL is a no-op") {
    val docs = graft.Tables(spark, sfDir).documents
      .select(Curation11.deriveUrl(col("doc_id"), col("source")).as("u"))
    val c1 = Curation11.canonUrlExpr(col("u"))
    assert(docs.where(Curation11.canonUrlExpr(c1) =!= c1).count() == 0L)
  }

  test("merge property on the derived population: variants collapse per (source, path), paths never collide") {
    val docs = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"))
      .withColumn("u", Curation11.deriveUrl(col("doc_id"), col("source")))
      .withColumn("canon", Curation11.canonUrlExpr(col("u")))
    // the canonical form is a pure function of (source, doc_id % 50)
    val groups = docs.groupBy(col("source"), (col("doc_id") % 50).as("path"))
      .agg(countDistinct(col("canon")).as("n_canon"))
    assert(groups.where(col("n_canon") =!= 1).count() == 0L,
      "every variant of a (source, path) group must share one canonical URL")
    // and distinct (source, path) groups never collide after folding
    val collisions = docs.select(col("source"), (col("doc_id") % 50).as("path"), col("canon"))
      .distinct()
      .groupBy("canon").agg(count(lit(1)).as("n"))
      .where(col("n") =!= 1)
    assert(collisions.count() == 0L, "canonicalization must not merge distinct pages")
  }
}
