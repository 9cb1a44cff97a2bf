package graft.functions.expr

import graft.functions.TextAnalysis
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression forms of the text-analysis functions (language-ID
  * and winnowing fingerprints) — same kernels as the UDF twins in
  * [[graft.functions.TextAnalysis]], minus the UDF encode/decode
  * boundary (Seq boxing + Row wrapping per call). */
object TextKernels {
  def langId(text: UTF8String): InternalRow = {
    val p = TextAnalysis.langIdImpl(if (text == null) "" else text.toString)
    new GenericInternalRow(Array[Any](UTF8String.fromString(p.lang), p.confidence))
  }

  def winnow(text: UTF8String, k: Int, w: Int): ArrayData =
    new GenericArrayData(
      TextAnalysis.winnowImpl(if (text == null) null else text.toString, k, w))
}

case class LangIdExpr(child: Expression) extends UnaryKernelExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("confidence", DoubleType, nullable = false)))
  override def prettyName: String = "graft_langid"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.langId(a.asInstanceOf[UTF8String])
  protected def genCall(c: String): String =
    s"graft.functions.expr.TextKernels.langId($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class WinnowExpr(child: Expression, kGram: Int, window: Int) extends UnaryKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.winnow(a.asInstanceOf[UTF8String], kGram, window)
  protected def genCall(c: String): String =
    s"graft.functions.expr.TextKernels.winnow($c, $kGram, $window)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExpressions {
  def langId(text: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text)))
  def winnow(text: Column, kGram: Int, window: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(text), kGram, window))
}
