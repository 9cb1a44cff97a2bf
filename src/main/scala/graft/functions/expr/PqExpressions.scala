package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou et al., TPAMI 2011) as native
  * codegen expressions. The dataflow formulation of PQ encode —
  * posexplode M segments × broadcast-join K codewords × argmax — builds
  * an M·K-row intermediate PER VECTOR (128 rows at M=8, K=16) plus a
  * shuffle to re-assemble the codes; these kernels compute all M argmins
  * in one call per vector, keeping the encode stage map-only and inside
  * whole-stage codegen. The codebook (M·K·subDim doubles — a few KB) is
  * trained on the driver and rides into generated code as a reference
  * object, the same way Spark ships literal arrays.
  *
  * Arithmetic matches the dataflow formulation bit-for-bit: the segment
  * score is 2·dot(sub, cw) − |cw|² with an ascending-index dot
  * (argmin L2 with the |sub|² constant dropped), ties to the smaller
  * code; the ADC partial distance is |cw|² − 2·dot(qsub, cw).
  */
object PqKernels {
  /** codes[seg] = argmax_code 2·dot(v[seg], cw[seg,code]) − |cw|². */
  def encode(v: ArrayData, cb: Array[Double], norms: Array[Double],
      m: Int, k: Int, subDim: Int): ArrayData = {
    val codes = new Array[Int](m)
    var seg = 0
    while (seg < m) {
      var best = 0
      var bestSc = Double.NegativeInfinity
      var code = 0
      while (code < k) {
        val idx = seg * k + code
        val base = idx * subDim
        var d = 0.0
        var j = 0
        while (j < subDim) { d += v.getDouble(seg * subDim + j) * cb(base + j); j += 1 }
        val sc = 2.0 * d - norms(idx)
        if (sc > bestSc) { bestSc = sc; best = code } // strict: ties keep the smaller code
        code += 1
      }
      codes(seg) = best
      seg += 1
    }
    new GenericArrayData(codes)
  }

  /** dt[seg·K + code] = |cw|² − 2·dot(q[seg], cw[seg,code]) — the
    * per-query ADC table (the constant |qsub|² shifts every candidate
    * equally and is omitted). */
  def distTable(qv: ArrayData, cb: Array[Double], norms: Array[Double],
      m: Int, k: Int, subDim: Int): ArrayData = {
    val pd = new Array[Double](m * k)
    var seg = 0
    while (seg < m) {
      var code = 0
      while (code < k) {
        val idx = seg * k + code
        val base = idx * subDim
        var d = 0.0
        var j = 0
        while (j < subDim) { d += qv.getDouble(seg * subDim + j) * cb(base + j); j += 1 }
        pd(idx) = norms(idx) - 2.0 * d
        code += 1
      }
      seg += 1
    }
    new GenericArrayData(pd)
  }

  /** Asymmetric Distance Computation: Σ_seg dt[seg·K + codes[seg]]. */
  def adc(codes: ArrayData, dt: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var seg = 0
    while (seg < m) { s += dt.getDouble(seg * k + codes.getInt(seg)); seg += 1 }
    s
  }
}

/** pq_encode(v) → array<int> of M codes. Codebook is a constructor
  * reference (driver-trained), not a child expression. */
case class PqEncode(child: Expression, cb: Array[Double], norms: Array[Double],
    m: Int, k: Int, subDim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  override protected def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], cb, norms, m, k, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
    val nRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expr.PqKernels.encode($v, $cbRef, $nRef, $m, $k, $subDim)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_dist_table(qv) → array<double> of M·K ADC partial distances. */
case class PqDistTable(child: Expression, cb: Array[Double], norms: Array[Double],
    m: Int, k: Int, subDim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_dist_table"
  override protected def nullSafeEval(v: Any): Any =
    PqKernels.distTable(v.asInstanceOf[ArrayData], cb, norms, m, k, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
    val nRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expr.PqKernels.distTable($v, $cbRef, $nRef, $m, $k, $subDim)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_adc(codes, dt) → double. */
case class PqAdc(left: Expression, right: Expression, k: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  override protected def nullSafeEval(codes: Any, dt: Any): Any =
    PqKernels.adc(codes.asInstanceOf[ArrayData], dt.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, d) =>
      s"graft.functions.expr.PqKernels.adc($c, $d, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level entry points. */
object PqExpressions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def pqEncode(v: Column, cb: Array[Double], norms: Array[Double],
      m: Int, k: Int, subDim: Int): Column = c(PqEncode(e(v), cb, norms, m, k, subDim))
  def pqDistTable(qv: Column, cb: Array[Double], norms: Array[Double],
      m: Int, k: Int, subDim: Int): Column = c(PqDistTable(e(qv), cb, norms, m, k, subDim))
  def pqAdc(codes: Column, dt: Column, k: Int): Column = c(PqAdc(e(codes), e(dt), k))
}
