package graft.plans

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction}

/** r18's biggest lever was replacing interpreted higher-order-function
  * trees (transform/aggregate/zip_with lambdas — all CodegenFallback:
  * evaluated per row through the interpreter even inside a
  * WholeStageCodegen stage) with defineCodeGen kernels. This gate makes
  * that program STICK: the bench's worst plans must stay free of
  * interpreted expression evaluation, so a convenience HOF can't
  * silently return to a hot path where host noise would hide it.
  *
  * Scope: the bench's heavy head (every query whose baseline cost
  * makes interpreter-per-row measurable) — asserted over EVERY
  * expression of the optimized physical plan, including subqueries.
  * An allowlist carries the audited exceptions (currently none).
  */
class CodegenFallbackGateSpec extends SparkSpecBase {

  /** Worst of the r19 baseline bench (120.7 s run, sf0.1) plus the rest
    * of the >1 s band — the set where a returning interpreted HOF costs
    * real time. Cheap-tail queries are census-pinned instead. */
  private val heavyHead = Seq(
    "q129_hybrid_rrf", "q115_neardup_decontam", "q177_minhash_calibration",
    "q147_knn_eval", "q28_dedup_ngram", "q191_fluency_buckets",
    "q159_threshold_sweep", "q158_incremental_cc", "q114_bloom_increment",
    "q125_bm25_queries", "q153_index_recall_sweep", "q102_ann_pq",
    "q29_dedup_minhash", "q112_vocab_oov", "q30_dedup_simhash",
    "q121_ann_sq8", "q108_source_dup_matrix", "q164_embedding_outliers",
    "q107_semdedup", "q109_token_budget_mix")

  /** Audited exceptions: className -> reason. Keep EMPTY unless a
    * fallback is proven cold (never per-corpus-row) AND kernelizing it
    * measured as a non-win; record the measurement in the reason. */
  private val allow: Map[String, String] = Map.empty

  private def offenders(name: String): Seq[String] = {
    spark.catalog.clearCache()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.executedPlan
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    def walkExpr(e: Expression): Unit = {
      e match {
        case h: HigherOrderFunction =>
          bad += s"HOF ${h.getClass.getSimpleName}: ${h.toString.take(120)}"
        // Imperative AGGREGATE functions (TopK's ScalaAggregator,
        // collect_set/collect_list, MapMergeAggregator) are exempt as a
        // class: they run through ObjectHashAggregate's update path by
        // design (the bounded-heap/dedup-buffer mechanism), not as a
        // per-row interpreted projection — the thing this gate guards.
        // Lambda plumbing nodes are exempt too: they only occur inside
        // a HigherOrderFunction, which is already flagged above.
        case _: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction => ()
        case _: org.apache.spark.sql.catalyst.expressions.LambdaFunction => ()
        case _: org.apache.spark.sql.catalyst.expressions.NamedLambdaVariable => ()
        case f: CodegenFallback if !allow.contains(f.getClass.getSimpleName) =>
          bad += s"CodegenFallback ${f.getClass.getSimpleName}: ${f.toString.take(120)}"
        case _ =>
      }
      e.children.foreach(walkExpr)
      // plan subqueries nested inside expressions
      e.collect { case p: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] => p }
        .foreach {
          _.plan match {
            case sp: org.apache.spark.sql.execution.SparkPlan => walkPlan(sp)
            case _ => ()
          }
        }
    }
    def walkPlan(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p.expressions.foreach(walkExpr)
      p.children.foreach(walkPlan)
      p.subqueries.foreach(walkPlan)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walkPlan(a.inputPlan)
        case i: org.apache.spark.sql.execution.InputAdapter => walkPlan(i.child)
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => walkPlan(w.child)
        case _ => ()
      }
    }
    walkPlan(plan)
    bad.distinct.map(b => s"$name: $b").toSeq
  }

  test("heavy-head plans contain zero interpreted HOFs / CodegenFallback expressions") {
    val all = heavyHead.flatMap(offenders)
    assert(all.isEmpty,
      s"${all.size} interpreted expression(s) in the heavy head:\n" + all.mkString("\n"))
  }

  test("the gate actually fires on a planted transform(sequence(...)) tree") {
    import org.apache.spark.sql.functions._
    // non-foldable source: a literal row would be constant-folded into
    // a LocalTableScan and the HOF would vanish before physical planning
    val df = spark.range(5)
      .select(col("id"),
        transform(sequence(lit(1), lit(3)), i => xxhash64(col("id"), i)).as("h"))
    val plan = df.queryExecution.executedPlan
    val found = scala.collection.mutable.ListBuffer.empty[String]
    def walk(e: Expression): Unit = {
      e match {
        case h: HigherOrderFunction => found += h.getClass.getSimpleName
        case _ =>
      }
      e.children.foreach(walk)
    }
    def walkP(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p.expressions.foreach(walk); p.children.foreach(walkP)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walkP(a.inputPlan)
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => walkP(w.child)
        case _ => ()
      }
    }
    walkP(plan)
    assert(found.nonEmpty, "planted interpreted HOF was not detected — the gate is blind")
  }
}
