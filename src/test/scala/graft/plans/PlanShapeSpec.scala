package graft.plans

import graft.{SparkEntry, SparkSpecBase}

/** Physical-plan shape gates for the pair-space operators: none of them
  * may plan a BroadcastNestedLoopJoin or CartesianProduct over the
  * corpus — the two shapes that are fine at test SF and fatal at 100×.
  * (Broadcast of a small *scalar/query/centroid* side is fine and
  * appears as BroadcastHashJoin / BroadcastExchange instead.)
  */
class PlanShapeSpec extends SparkSpecBase {

  private def executed(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  for (q <- Seq("q33_dedup_embed", "q100_allpairs_jaccard", "q84_dup_clusters",
                "q89_curation_pipeline", "q28_dedup_ngram", "q29_dedup_minhash",
                "q103_decontamination", "q108_source_dup_matrix"))
    test(s"$q plans no nested-loop or cartesian corpus join") {
      val plan = executed(q)
      assert(!plan.contains("BroadcastNestedLoop"), s"$q plans BroadcastNestedLoopJoin")
      assert(!plan.contains("CartesianProduct"), s"$q plans CartesianProduct")
    }

  // q107 (like q31/q37) legitimately broadcasts the 16-row centroid set
  // against the corpus — a map-only pass that stringifies as
  // BroadcastNestedLoopJoin. The gate for it is that the PAIR stage is
  // an equi-join on the cell id, never a corpus-level loop join.
  test("q107_semdedup pair stage is an equi-join on the quantizer cell") {
    val plan = executed("q107_semdedup")
    assert(plan.contains("cent_id"), "cell key missing from plan")
    val pairJoinIsEqui = Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
      .exists(plan.contains)
    assert(pairJoinIsEqui, "q107 pair join planned as a non-equi join")
    assert(!plan.contains("CartesianProduct"), "q107 plans CartesianProduct")
  }

  // q109's only loop joins are the 1-row scalar broadcasts (corpus
  // total, tempered-share normalizer — the q105 pattern); the per-doc
  // joins (bucket offsets, language budgets) must be equi-joins.
  test("q109_token_budget_mix loop joins are scalar-only; doc joins are equi") {
    val plan = executed("q109_token_budget_mix")
    val docCols = Seq("doc_id", "bucket#", "h#")
    plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).foreach { l =>
      assert(!docCols.exists(l.contains), s"corpus-level loop join: $l")
    }
    assert(plan.contains("BroadcastHashJoin"), "doc-level joins should be broadcast equi-joins")
    assert(!plan.contains("CartesianProduct"), "q109 plans CartesianProduct")
  }
}
