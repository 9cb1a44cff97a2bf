package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native AS-OF join — the whole-operator custom-plan tier (preference
  * (c) of the build rules): for every left row, attach the latest right
  * row of the same key with `rightTime <= leftTime`, in ONE pass.
  *
  * The composed formulation (graft.queries.Relational.q19: union both
  * sides, window carry-forward, filter) needs a union shuffle + a window
  * sort over left+right combined. This operator instead declares
  * `ClusteredDistribution` on the keys and per-partition ordering on
  * (key, time) for both children, then streams a sort-merge with O(1)
  * state (the last matching right row) — half the sorted bytes and no
  * union materialization. Output = left ⟕ right (right side nulled when
  * no as-of match exists).
  *
  * Ties: among right rows with equal (key, time) the last in sort order
  * wins — dedup upstream for full determinism (q19 does the same).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = BindReferences.bindReference(leftKey: Expression, lOut)
    val rk = BindReferences.bindReference(rightKey: Expression, rOut)
    val lt = BindReferences.bindReference(leftTime: Expression, lOut)
    val rt = BindReferences.bindReference(rightTime: Expression, rOut)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val schema = output
    val rWidth = rOut.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(schema, schema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rWidth)
      val rBuffered = rIter.buffered
      new Iterator[InternalRow] {
        private var lastMatch: InternalRow = _
        private var lastMatchKey: Any = _

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKeyV = lk.eval(lRow)
          val lTimeV = lt.eval(lRow)
          if (lKeyV == null) return proj(joined(lRow, nullRight))
          // advance the right side up to (key, time]
          var advance = true
          while (advance && rBuffered.hasNext) {
            val rRow = rBuffered.head
            val rKeyV = rk.eval(rRow)
            if (rKeyV == null) { rBuffered.next() } // null keys never match
            else {
              val kc = keyOrd.compare(rKeyV, lKeyV)
              if (kc < 0) rBuffered.next() // key passed; drop
              else if (kc == 0 && timeOrd.compare(rt.eval(rRow), lTimeV) <= 0) {
                lastMatch = rRow.copy(); lastMatchKey = rKeyV
                rBuffered.next()
              } else advance = false
            }
          }
          val matched =
            if (lastMatch != null && keyOrd.compare(lastMatchKey, lKeyV) == 0) lastMatch
            else nullRight
          proj(joined(lRow, matched))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** User API + strategy registration. */
object AsOf {
  private def resolve(df: DataFrame, name: String): Attribute =
    df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not in [${df.queryExecution.analyzed.output.map(_.name).mkString(", ")}]"))

  /** Register the planner strategy once per session (also injectable via
    * `spark.sql.extensions=graft.GraftExtensions`). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    ColumnBridge.ofRows(spark, AsOfJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      resolve(left, leftKey), resolve(right, rightKey),
      resolve(left, leftTime), resolve(right, rightTime)))
  }
}
