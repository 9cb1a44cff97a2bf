package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Semantic properties of the second curation batch beyond the oracle
  * hash-match: budget maximality for the token mixer, keep-rule shape
  * for SemDeDup, and truncation-recall sanity for matryoshka. */
class Curation2Spec extends SparkSpecBase {

  test("q109: per-language selections are budget-maximal prefixes") {
    val out = Curation2.q109.run(spark, sfDir)
    import spark.implicits._
    val rows = out.select("lang", "n_tokens", "cum").as[(String, Long, Long)].collect()
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      val cums = rs.map(_._3).sorted
      // cum is the inclusive running sum in selection order: the last
      // selected doc's cum equals the sum of selected token counts
      assert(cums.last == rs.map(_._2).sum, s"$lang: cum chain broken")
    }
    // maximality: a selection is never empty when ANY doc of that lang
    // fits the budget — every language present in the corpus appears
    // unless its smallest first-ordered doc overflows (can't happen at
    // ~50% total budget with per-doc tokens ≪ budget)
    val langs = graft.Tables(spark, sfDir).documents
      .select("lang").distinct().as[String].collect().toSet
    assert(byLang.keySet == langs)
  }

  test("q107: pairs stay inside one cell and keep rule is a_id < b_id") {
    val out = Curation2.q107.run(spark, sfDir)
    import spark.implicits._
    val rows = out.select("cell_id", "a_id", "b_id").as[(Long, Long, Long)].collect()
    assert(rows.forall { case (_, a, b) => a < b })
    // every pair's members resolve to the same quantizer cell by
    // construction — cell_id column is a single value per pair
    assert(out.where(col("cell_id").isNull).count() == 0)
  }

  test("q106: top-5 overlap with the full ranking grows with prefix width") {
    import spark.implicits._
    def total(dims: Int): Long =
      Curation2.matryoshkaOverlap(spark, sfDir, dims).select("n_overlap").as[Long].collect().sum
    val (o8, o16, o48) = (total(8), total(16), total(48))
    assert(o8 >= 0 && o48 <= 50)
    // fidelity is monotone-ish in width; these synthetic embeddings
    // spread energy across all dims (no matryoshka training), so the
    // absolute numbers are low — the DIAL is what must work
    assert(o16 >= o8, s"overlap(16)=$o16 < overlap(8)=$o8")
    assert(o48 > o8, s"overlap(48)=$o48 !> overlap(8)=$o8")
  }

  test("q108: pair counts are symmetric-free and bounded by source-pair space") {
    val out = Curation2.q108.run(spark, sfDir)
    import spark.implicits._
    val rows = out.select("src_a", "src_b").as[(String, String)].collect()
    assert(rows.forall { case (a, b) => a < b })
    assert(rows.distinct.length == rows.length)
    val nSources = graft.Tables(spark, sfDir).documents
      .select("source").distinct().count()
    assert(rows.length <= nSources * (nSources - 1) / 2)
  }
}
