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
                "q103_decontamination"))
    test(s"$q plans no nested-loop or cartesian corpus join") {
      val plan = executed(q)
      assert(!plan.contains("BroadcastNestedLoop"), s"$q plans BroadcastNestedLoopJoin")
      assert(!plan.contains("CartesianProduct"), s"$q plans CartesianProduct")
    }
}
