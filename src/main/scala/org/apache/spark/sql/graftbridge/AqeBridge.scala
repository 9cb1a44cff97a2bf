package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.{CollectMetricsExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Observed-metrics recovery for AQE-pruned subtrees.
  *
  * `QueryExecution.observedMetrics` walks the FINAL adaptive plan — but
  * AQE's empty-relation propagation rewrites a runtime-empty subtree
  * (an empty join side, a union branch that produced no rows) into an
  * empty relation AFTER its stages materialized, removing any
  * `CollectMetrics` node inside it from the final tree. The metrics
  * were computed (the stage ran; the accumulator holds them) but the
  * standard walk can no longer reach the node. For a cap-observability
  * design ([[graft.metrics.CapObservatory]]) this is the worst possible
  * failure mode: a capped LSH bucket join whose candidate pairs all get
  * dropped produces an EMPTY pair relation — i.e. the exact executions
  * where the cap engaged are the ones whose drop metrics would vanish.
  *
  * The recovery: every materialized stage of the execution lives in the
  * AQE context's stage cache regardless of later pruning, so collecting
  * `CollectMetricsExec` from those cached stage plans (plus the final
  * plan, which wins on key collisions — same node, same accumulator)
  * yields the complete metric set. Bridged from an `org.apache.spark.
  * sql` subpackage because the stage cache and `collectedMetrics` are
  * `private[sql]`-adjacent internals.
  */
object AqeBridge {

  /** All named observed metrics of `qe`, including those whose
    * `CollectMetrics` node was pruned from the final adaptive plan
    * after its stage materialized. Best-effort: internal-API drift
    * degrades to the standard `observedMetrics` walk, never throws. */
  def observedMetricsWithPruned(qe: QueryExecution): Map[String, Row] = {
    val fromStages = scala.collection.mutable.Map.empty[String, Row]
    def walk(p: SparkPlan): Unit = {
      p match {
        case c: CollectMetricsExec =>
          fromStages(c.name) = c.collectedMetrics
        case _ => ()
      }
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec =>
          a.context.stageCache.values.toSeq.map(_.plan) :+ a.executedPlan
        case s: QueryStageExec => Seq(s.plan)
        case o => o.children
      }
      kids.foreach(walk)
    }
    try walk(qe.executedPlan) catch { case _: Throwable => () }
    fromStages.toMap ++ qe.observedMetrics
  }
}
