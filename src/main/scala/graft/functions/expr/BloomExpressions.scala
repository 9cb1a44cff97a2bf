package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** bloom_might_contain(h) over a driver-built [[BloomFilter]] sketch.
  *
  * The sketch is a constructor reference (like the ANN quantizer state
  * in [[NearestCentroidId]]), not a child expression: it is built once
  * by a distributed treeAggregate (`df.stat.bloomFilter`) and rides to
  * executors with the serialized plan — a few MB standing in for a
  * relation that would otherwise have to be shuffled or broadcast in
  * full. Guarantees: no false negatives, so `where(bloomMightContain)`
  * is a sound PREFILTER — downstream exact confirmation sees a superset
  * of the true matches and the final result is independent of the
  * false-positive rate.
  */
case class BloomMightContainLong(child: Expression, bf: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"
  override protected def nullSafeEval(h: Any): Any =
    bf.mightContainLong(h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bf, "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, h => s"$ref.mightContainLong($h)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BloomExpressions {
  def bloomMightContainLong(h: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(h), bf))
}
