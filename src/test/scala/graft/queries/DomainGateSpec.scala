package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** q195's domain gate kernels: registrable-domain extraction fixtures
  * (incl. the multi-label co.uk suffix and subdomain stripping), the
  * allowlist-wins verdict algebra, and conservation of the census
  * bill on the derived population. */
class DomainGateSpec extends SparkSpecBase {
  import spark.implicits._

  private def regdom(urls: Seq[String]): Seq[String] =
    urls.toDF("u").select(Curation17.registeredDomain(col("u"))).as[String].collect().toSeq

  test("registered-domain extraction: single- vs multi-label suffixes, subdomains stripped") {
    val cases = Seq(
      "host5.org/s/p1" -> "host5.org",
      "blog.host3.com/s/p2" -> "host3.com",
      "cdn.host17.co.uk/s/p3" -> "host17.co.uk",
      "host0.co.uk/s/p4" -> "host0.co.uk",
      "a.b.host9.net/s/p5" -> "host9.net",
      // host only, no path
      "host1.com" -> "host1.com")
    assert(regdom(cases.map(_._1)) == cases.map(_._2))
  }

  test("gate verdict: allowlist overrides blocklist; kept = not blocked or allowed") {
    val df = Seq("host5.org", "host17.co.uk", "host3.com", "host9.net").toDF("regdom")
      .select(col("regdom"),
        Curation17.inBlocklist(col("regdom")).as("blocked"),
        Curation17.inAllowlist(col("regdom")).as("allowed"))
    df.collect().foreach { r =>
      val kept = !r.getBoolean(1) || r.getBoolean(2)
      // the three census classes partition every doc exactly once
      val classes = Seq(
        r.getBoolean(1) && !r.getBoolean(2), // blocked
        r.getBoolean(1) && r.getBoolean(2),  // allowlisted
        !r.getBoolean(1))                    // never listed
      assert(classes.count(identity) == 1)
      assert(kept == (classes(1) || classes(2)))
    }
  }

  test("census conservation on the derived population: blocked + allowlisted + clean = n_docs") {
    val out = Curation17.q195.run(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val b = r.getAs[Long]("n_blocked_docs")
      val a = r.getAs[Long]("n_allowlisted_docs")
      val k = r.getAs[Long]("n_kept_docs")
      assert(b + k == n, s"source ${r.getString(0)}: blocked+kept != n_docs")
      assert(a <= k, "allowlisted docs are a subset of kept docs")
    }
    // both list paths fire at CORPUS level (per-source counts can be 0
    // at sf0.001 — 25 docs per source against a ~14% override draw)
    assert(rows.map(_.getAs[Long]("n_blocked_docs")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_allowlisted_docs")).sum > 0)
  }
}
