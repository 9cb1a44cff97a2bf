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

object BloomKernels {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** xxhash64(element, seed 42) — Spark's XxHash64 over a UTF8String,
    * with the null-input convention (hash of null = the seed). */
  private def xx64(s: org.apache.spark.unsafe.types.UTF8String): Long =
    if (s == null) 42L
    else org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** One-pass sharded bloom prefilter of a span array — exact twin of
    * `filter(arr, sp -> pmod(xxhash64(sp), shards) = s_0 &&
    * might_contain_s0 || ...)` (r19: the interpreted ArrayFilter
    * evaluated the lambda per element; this keeps each kept element's
    * order and identity). With shards == 1 the pmod routing degenerates
    * to the single-sketch probe. */
  def filterSpans(arr: ArrayData, blooms: Array[BloomFilter], shards: Int): ArrayData = {
    val n = arr.numElements()
    val kept = new Array[Any](n)
    var k = 0
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val h = xx64(s)
      val sh = if (shards == 1) 0 else { val r = (h % shards).toInt; if (r < 0) r + shards else r }
      if (blooms(sh).mightContainLong(h)) { kept(k) = s; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(kept.asInstanceOf[Array[AnyRef]], k))
  }
}

/** In-row bloom prefilter over a span array: keeps exactly the spans
  * whose (sharded) sketch probe fires. Replaces the interpreted
  * `filter(_sp, sp -> might_contain(xxhash64(sp)))` ArrayFilter in the
  * q114 / streaming bloom-ingest probe with a single straight-line
  * kernel call per row. Sketches are constructor references like
  * [[BloomMightContainLong]]'s. */
case class BloomFilterSpans(child: Expression, blooms: Array[BloomFilter], shards: Int)
    extends UnaryExpression {
  require(blooms.length == shards && shards >= 1)
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_bloom_filter_spans"
  override protected def nullSafeEval(a: Any): Any =
    BloomKernels.filterSpans(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], blooms, shards)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blooms", blooms,
      "org.apache.spark.util.sketch.BloomFilter[]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.expr.BloomKernels.filterSpans($a, $ref, $shards)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BloomExpressions {
  def bloomMightContainLong(h: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(h), bf))
  def bloomFilterSpans(arr: Column, blooms: Array[BloomFilter]): Column =
    ColumnBridge.column(BloomFilterSpans(ColumnBridge.expression(arr), blooms, blooms.length))
}
