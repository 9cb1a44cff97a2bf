package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Compat shim: `classic.ExpressionUtils` is `private[sql]` in Spark 4,
  * so the Column⇄Expression bridge lives inside the sql namespace (the
  * standard extension-library pattern). Single point of contact with
  * semi-public API — everything else in graft uses only this. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame over a custom LogicalPlan (classic.Dataset.ofRows
    * is `private[sql]`). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Identity snapshot of the session's CacheManager entries — taken
    * by graft.Bench right after the family prime so the family-block
    * sweep can distinguish "the shared family cache" from "entries a
    * family member leaked". The CachedData list is a private field
    * (reflection through the accessor; single point of contact with
    * the internal, like everything in this bridge). */
  def cachedEntryRefs(spark: org.apache.spark.sql.SparkSession): Seq[AnyRef] =
    cachedData(spark)

  /** Drop every CacheManager ENTRY (and its blocks) not identity-listed
    * in `keep`. This is the piece `getPersistentRDDs`-level sweeping
    * cannot do: unpersisting only the RDD under a cache entry leaves a
    * DEAD entry behind, and a later query whose plan matches it gets an
    * InMemoryRelation substituted that recomputes without ever caching
    * — while its own `.persist` no-ops as "already cached". `cascade =
    * false` because the kept family entries must survive even when a
    * dropped entry's plan feeds them. */
  def uncacheEntriesExcept(spark: org.apache.spark.sql.SparkSession,
      keep: Seq[AnyRef]): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cm = cs.sharedState.cacheManager
    // identity first, plan equivalence as the fallback (ADVICE r16): a
    // recache during the family block (recacheByPlan/refreshByPath)
    // rebuilds CachedData instances, so an eq-only keep test would
    // silently sweep the shared family cache and every later family
    // member would re-time the full pair build.
    val keepPlans = keep.collect {
      case cd: org.apache.spark.sql.execution.CachedData => cd.plan
    }
    cachedData(spark).foreach { cd =>
      val plan = cd.asInstanceOf[org.apache.spark.sql.execution.CachedData].plan
      val kept = keep.exists(_ eq cd) || keepPlans.exists(_.sameResult(plan))
      if (!kept)
        cm.uncacheQuery(cs, plan, cascade = false, blocking = true)
    }
  }

  private def cachedData(spark: org.apache.spark.sql.SparkSession): Seq[AnyRef] = {
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    val m = cm.getClass.getDeclaredMethod("cachedData")
    m.setAccessible(true)
    m.invoke(cm).asInstanceOf[scala.collection.immutable.IndexedSeq[AnyRef]].toSeq
  }

  /** Free the storage of a `localCheckpoint()`ed DataFrame. The blocks
    * live on the backing checkpointed RDD (not in the cache manager),
    * so `Dataset.unpersist()` cannot reach them; iterative drivers that
    * checkpoint per round must release prior generations through the
    * LogicalRDD node or leak one generation per iteration. No-op for
    * non-checkpoint plans. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ =>
    }
}
