package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native RANGE (interval-containment) join — the second whole-operator
  * custom plan (tier (c)): left rows attach to every right interval
  * with `lo <= t < hi`.
  *
  * Vanilla Spark plans an inequality-only join as
  * BroadcastNestedLoopJoin: every left row probes EVERY interval —
  * O(|left|·|right|). This operator requires a broadcast of the
  * interval side (intervals are rule/calendar-sized in practice) and
  * probes a sorted interval index instead:
  *
  *  - intervals sorted by `lo`, with a prefix-maximum of `hi`;
  *  - per left row: binary-search the last `lo <= t`, then walk left
  *    while the prefix-max `hi` can still exceed `t` — touching only
  *    candidate intervals, O(log m + matches) for non-pathological
  *    (bounded-nesting) interval sets.
  *
  * The composed twin (q90: day-bucket replication + equi-join) is the
  * shuffle-based recipe for interval sides too big to broadcast; this
  * exec is the broadcast path with no replication factor to tune.
  * Time/bound types: timestamp, long, int, or date (any type whose
  * internal form is an integral).
  */
case class RangeJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftTime: Attribute, lo: Attribute, hi: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object RangeJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(l, r, t, lo, hi) =>
      RangeJoinExec(planLater(l), planLater(r), t, lo, hi) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftTime: Attribute, lo: Attribute, hi: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  private def toL(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case null => throw new IllegalArgumentException(
      "null range bound reached the index (null-bounded intervals are filtered before build)")
    case other => throw new IllegalArgumentException(
      s"range-join bound must be integral-backed (timestamp/long/int/date), got $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val bc = right.executeBroadcast[Array[InternalRow]]()
    val loB = BindReferences.bindReference(lo: Expression, right.output)
    val hiB = BindReferences.bindReference(hi: Expression, right.output)
    val tB = BindReferences.bindReference(leftTime: Expression, left.output)
    val schema = output

    left.execute().mapPartitions { lIter =>
      // build the sorted index once per partition from the broadcast;
      // null-bounded intervals can never satisfy lo <= t < hi (SQL
      // comparison semantics — the equi-join twin drops them too), so
      // they are excluded rather than crashing the index build
      val rows = bc.value.filter(r => loB.eval(r) != null && hiB.eval(r) != null)
      val m = rows.length
      val order = Array.range(0, m).sortBy(i => toL(loB.eval(rows(i))))
      val loV = order.map(i => toL(loB.eval(rows(i))))
      val hiV = order.map(i => toL(hiB.eval(rows(i))))
      val sorted = order.map(rows(_))
      val prefixMaxHi = new Array[Long](m)
      var i = 0
      var mx = Long.MinValue
      while (i < m) { mx = math.max(mx, hiV(i)); prefixMaxHi(i) = mx; i += 1 }

      val proj = UnsafeProjection.create(schema, schema)
      val joined = new JoinedRow

      lIter.flatMap { lRow =>
        val tv = tB.eval(lRow)
        if (tv == null || m == 0) Iterator.empty
        else {
          val t = toL(tv)
          // last index with lo <= t
          var a = 0; var b = m - 1; var idx = -1
          while (a <= b) {
            val mid = (a + b) >>> 1
            if (loV(mid) <= t) { idx = mid; a = mid + 1 } else b = mid - 1
          }
          // project only at next(): proj reuses its buffer, so a row
          // must never be held across the search for the following one
          new Iterator[InternalRow] {
            private var j = idx
            private var pending = -1 // -1 = unsought, -2 = exhausted
            private def seek(): Unit = {
              if (pending != -1) return
              while (j >= 0 && prefixMaxHi(j) > t) {
                val k = j; j -= 1
                if (hiV(k) > t) { pending = k; return }
              }
              pending = -2
            }
            override def hasNext: Boolean = { seek(); pending >= 0 }
            override def next(): InternalRow = {
              seek(); val k = pending; pending = -1
              proj(joined(lRow, sorted(k)))
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** User API + strategy registration. */
object RangeJoinApi {
  private def resolve(out: Seq[Attribute], name: String): Attribute =
    out.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not in [${out.map(_.name).mkString(", ")}]"))

  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy

  /** Inner-join `left` rows to every `right` interval with
    * `lo <= leftTime < hi`. The right side is broadcast. */
  def join(left: DataFrame, right: DataFrame,
      leftTime: String, lo: String, hi: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    // The node is built from two already-analyzed plans, skipping the
    // attribute dedup a normal join gets in analysis. If both sides
    // derive from the same DataFrame they share exprIds, and the output
    // projection would bind right columns to the LEFT occurrence —
    // silently wrong values. Re-alias the right side to fresh exprIds
    // whenever any overlap exists.
    val rPlan: LogicalPlan =
      if (rAnalyzed.output.exists(lPlan.outputSet.contains))
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
      else rAnalyzed
    ColumnBridge.ofRows(spark, RangeJoin(
      lPlan, rPlan,
      resolve(lPlan.output, leftTime), resolve(rPlan.output, lo), resolve(rPlan.output, hi)))
  }
}
