package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels invoked from generated code. Scala objects emit static
  * forwarders, so whole-stage codegen calls these directly — one virtual
  * call per row instead of an interpreted lambda tree per element (the
  * cost that made the higher-order-function formulation the bench
  * hotspot: 58 s for 2M cosine pairs at sf0.1).
  *
  * Accumulation order is a single ascending-index pass, matching both
  * the previous zip_with/aggregate formulation and DuckDB's
  * list_cosine_similarity loop — bit-identical results, so the oracle
  * hash checks are unaffected.
  */
object SimilarityKernels {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Jaccard |A∩B| / |A∪B| over two string arrays that are already
    * distinct (shingle sets). |∪| = |A|+|B|-|∩|, one hash probe per
    * element — replaces array_intersect + array_union + two size() calls
    * (four interpreted passes and two array allocations per pair). */
  def jaccardDistinct(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val (small, large) = if (na <= nb) (a, b) else (b, a)
    val set = new java.util.HashSet[UTF8String](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) { set.add(small.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < large.numElements()) {
      if (set.contains(large.getUTF8String(i))) inter += 1
      i += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Jaccard over two ascending-sorted distinct long arrays (hashed
    * shingle sets): branchless-ish merge walk, zero allocation. The
    * 64-bit hashing step (xxhash64 per shingle, once per document)
    * makes set elements fixed-width, so the pair join ships ~2.5× fewer
    * bytes than string shingles and the per-pair cost is a pure linear
    * merge instead of a HashSet build. */
  def jaccardSortedLong(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Jaro-Winkler similarity over two strings — classic formulation
    * (match window ⌊max/2⌋−1, half-transpositions, Winkler prefix boost
    * p=0.1 · ℓ≤4 applied only when jaro > 0.7), matching DuckDB's
    * `jaro_winkler_similarity` including its empty-string → 0 edge.
    * Spark has no built-in; this is the fuzzy-match primitive for
    * record linkage over short strings (names, titles). Operates on
    * UTF-16 code units — identical across engines for BMP text. */
  def jaroWinkler(sa: UTF8String, sb: UTF8String): Double = {
    val a = sa.toString
    val b = sb.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aFlags = new Array[Boolean](la)
    val bFlags = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bFlags(j) && b.charAt(j) == a.charAt(i)) {
          bFlags(j) = true; aFlags(i) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aFlags(i)) {
        while (!bFlags(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2.0) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val maxL = math.min(4, math.min(la, lb))
      var l = 0
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** Integer dot product over two array<long> code vectors (the SQ8
    * scan's inner loop) — exact twin of
    * `aggregate(zip_with(a, b, _*_), 0L, _+_)`, which evaluates as an
    * INTERPRETED lambda tree per element (ArrayAggregate/zip_with are
    * CodegenFallback; profiled as the dominant compute frames of the
    * q121/q123/q147 family: BinaryArithmetic.eval + ArrayAggregate.eval).
    * Null/length semantics mirror the HOF chain exactly: zip_with pads
    * the shorter side with nulls and the product/sum propagate, so a
    * length mismatch or a null element yields NULL; otherwise the
    * ascending-index sum of products — integer arithmetic, so the
    * result is bit-identical in any order and equals the oracle's
    * list_aggregate sum. */
  def dotLongBoxed(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** Count of positions where two array<long> vectors carry equal
    * non-null values — exact twin of
    * `aggregate(zip_with(a, b, (x, y) => when(x === y, 1L).otherwise(0L)), 0L, _+_)`
    * (q177's per-pair matching-minhash-component count): a null on
    * either side compares null and falls to the otherwise-0, padded
    * positions from a length mismatch likewise, so the count never
    * goes null and equals the equal-position count within the common
    * prefix length. */
  def matchCountLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** SQ8 encode of one vector against the broadcast per-dim (mins,
    * maxs) stats row — exact twin of the `transform(arr, (x, i) =>
    * when(maxs[i+1] > mins[i+1], least(floor((x - mn) * 255 / (mx -
    * mn)), 254) - 127).otherwise(0))` HOF it replaces (ArrayTransform
    * is CodegenFallback: the encode ran as an interpreted lambda tree
    * per element over every corpus row of all 13 SQ8-family queries).
    * Edge semantics mirror the expression chain exactly:
    *  - a vector longer than the stats arrays throws, as ANSI
    *    `element_at` past the end did (unreachable in production —
    *    [[graft.queries.Curation5.sqStats]] derives the stats from the
    *    same corpus, so they span every dim any vector has);
    *  - a null stats ELEMENT makes the `when` predicate NULL →
    *    otherwise-0;
    *  - the mx > mn compare uses Spark's double total order (NaN
    *    greatest), not the IEEE primitive;
    *  - a null vector element under a true predicate propagates to a
    *    null OUTPUT element (arithmetic on null);
    *  - float inputs widen exactly (the same cast the HOF applied).
    * Arithmetic is the identical IEEE chain — floor, long cap at 254,
    * −127 — so codes are bit-equal to the oracle's. */
  def sqEncode(v: ArrayData, mins: ArrayData, maxs: ArrayData,
      floatElems: Boolean): ArrayData = {
    val n = v.numElements()
    val nm = mins.numElements()
    val nx = maxs.numElements()
    val out = new Array[Long](n)
    var nulls: Array[Boolean] = null
    var i = 0
    while (i < n) {
      if (i >= nm || i >= nx)
        throw new ArrayIndexOutOfBoundsException(
          s"graft_sq_encode: vector dim ${i + 1} beyond stats arrays " +
            s"($nm mins / $nx maxs) — ANSI element_at would throw here")
      if (mins.isNullAt(i) || maxs.isNullAt(i)) {
        out(i) = 0L // when-predicate NULL → otherwise(0)
      } else {
        val mn = mins.getDouble(i)
        val mx = maxs.getDouble(i)
        // Spark's double comparison: NaN ranks greatest (and only the
        // NaN corner differs from the primitive >)
        val gt = (java.lang.Double.isNaN(mx) && !java.lang.Double.isNaN(mn)) || mx > mn
        if (!gt) out(i) = 0L
        else if (v.isNullAt(i)) {
          if (nulls == null) nulls = new Array[Boolean](n)
          nulls(i) = true
        } else {
          val x = if (floatElems) v.getFloat(i).toDouble else v.getDouble(i)
          val f = math.floor((x - mn) * 255.0 / (mx - mn)).toLong
          out(i) = math.min(f, 254L) - 127L
        }
      }
      i += 1
    }
    if (nulls == null) {
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val boxed = new Array[Any](n)
      var j = 0
      while (j < n) { boxed(j) = if (nulls(j)) null else out(j); j += 1 }
      new GenericArrayData(boxed)
    }
  }

  /** |A∩B| over two ascending-sorted distinct long arrays — the same
    * merge walk as [[jaccardSortedLong]] but returning the raw count, so
    * asymmetric measures (containment |A∩B|/|A|, overlap coefficient)
    * stay exact integer-ratio divisions. */
  def intersectSortedLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}

/** IVF coarse-quantizer kernels. The dataflow formulation of centroid
  * assignment — crossJoin(broadcast(centroids)) → per-pair cosine →
  * max_by groupBy — re-shuffles every corpus vector NList times, each
  * row carrying the full embedding array, to compute what is a per-row
  * argmax over driver-resident state (FAISS keeps the coarse quantizer
  * exactly there). These kernels make assignment and probe selection
  * map-only: the centroid matrix rides into generated code as a
  * reference object. Cosine is accumulated in the same interleaved
  * order as [[SimilarityKernels.cosine]], so the assignment is
  * bit-identical to the max_by formulation it replaces (which the q37
  * DuckDB oracle replays value-for-value). */
object IvfKernels {
  private def cosineAt(v: ArrayData, cents: Array[Double], base: Int, dim: Int): Double = {
    val n = math.min(v.numElements(), dim)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val y = cents(base + i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** ids(argmax_ci cosine(v, cents[ci])) — strict `>` with an ascending
    * scan keeps the smallest index on ties, matching
    * `max_by(struct(dist, -cent_id))` (ids must be in ascending order). */
  def nearestCentroid(v: ArrayData, cents: Array[Double], ids: Array[Long], dim: Int): Long = {
    var best = 0
    var bestCos = Double.NegativeInfinity
    var ci = 0
    while (ci * dim < cents.length) {
      val cos = cosineAt(v, cents, ci * dim, dim)
      // Double.compare implements Spark's SQL double ordering (NaN is
      // greater than everything and equal to itself) — a zero-norm
      // vector's NaN cosine ranks like the max_by dataflow ranked it
      // instead of being silently skipped.
      if (java.lang.Double.compare(cos, bestCos) > 0) { bestCos = cos; best = ci }
      ci += 1
    }
    ids(best)
  }

  /** The `nprobe` centroid ids nearest to qv, ordered by (cosine DESC,
    * id ASC) — same order as the row_number window this replaces. */
  def probeCentroids(qv: ArrayData, cents: Array[Double], ids: Array[Long],
      dim: Int, nprobe: Int): ArrayData = {
    val k = ids.length
    val cos = new Array[Double](k)
    var ci = 0
    while (ci < k) { cos(ci) = cosineAt(qv, cents, ci * dim, dim); ci += 1 }
    val taken = new Array[Boolean](k)
    val out = new Array[Long](math.min(nprobe, k))
    var p = 0
    while (p < out.length) {
      var best = -1
      var bestCos = Double.NaN
      ci = 0
      while (ci < k) {
        // Spark double ordering (NaN greatest, ties → smallest id via
        // strict > on an ascending scan); best can no longer stay -1
        // once any untaken slot remains, so NaN cosines from zero-norm
        // vectors rank first instead of crashing the selection loop.
        if (!taken(ci) && (best == -1 ||
            java.lang.Double.compare(cos(ci), bestCos) > 0)) {
          bestCos = cos(ci); best = ci
        }
        ci += 1
      }
      taken(best) = true
      out(p) = ids(best)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** nearest_centroid(v) → bigint centroid id; centroids are constructor
  * references (driver-resident quantizer state), not child expressions. */
case class NearestCentroidId(child: Expression, cents: Array[Double],
    ids: Array[Long], dim: Int) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_nearest_centroid"
  override protected def nullSafeEval(v: Any): Any =
    IvfKernels.nearestCentroid(v.asInstanceOf[ArrayData], cents, ids, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    val iRef = ctx.addReferenceObj("ivfIds", ids, "long[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expr.IvfKernels.nearestCentroid($v, $cRef, $iRef, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** probe_centroids(qv) → array<bigint> of the nprobe nearest centroid ids. */
case class ProbeCentroidIds(child: Expression, cents: Array[Double],
    ids: Array[Long], dim: Int, nprobe: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_probe_centroids"
  override protected def nullSafeEval(v: Any): Any =
    IvfKernels.probeCentroids(v.asInstanceOf[ArrayData], cents, ids, dim, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    val iRef = ctx.addReferenceObj("ivfIds", ids, "long[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expr.IvfKernels.probeCentroids($v, $cRef, $iRef, $dim, $nprobe)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

abstract class BinaryKernelExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  /** Fully-qualified static call target in [[SimilarityKernels]]. */
  protected def kernel: String
  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalKernel(a: ArrayData, b: ArrayData): Double
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.SimilarityKernels.$kernel($a, $b)")
}

/** cosine(a, b) over array<double> — codegen-native. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryKernelExpression {

  override def prettyName: String = "graft_cosine"
  protected def kernel: String = "cosine"
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = SimilarityKernels.cosine(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** dot(a, b) over array<double> — codegen-native. */
case class DotProduct(left: Expression, right: Expression) extends BinaryKernelExpression {

  override def prettyName: String = "graft_dot"
  protected def kernel: String = "dot"
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = SimilarityKernels.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** jaccard(a, b) over two distinct array<string> shingle sets. */
case class JaccardDistinct(left: Expression, right: Expression) extends BinaryKernelExpression {

  override def prettyName: String = "graft_jaccard"
  protected def kernel: String = "jaccardDistinct"
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = SimilarityKernels.jaccardDistinct(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** jaccard(a, b) over two sorted distinct array<long> (hashed shingles). */
case class JaccardSortedLong(left: Expression, right: Expression) extends BinaryKernelExpression {

  override def prettyName: String = "graft_jaccard_hashed"
  protected def kernel: String = "jaccardSortedLong"
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = SimilarityKernels.jaccardSortedLong(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** jaro_winkler(a, b) over two strings — codegen-native. */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimilarityKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.SimilarityKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Integer dot over two array<long> SQ8 code vectors — codegen-native.
  * Nullable: mirrors the zip_with/aggregate null propagation it
  * replaces (length mismatch or null element → NULL). */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimilarityKernels.dotLongBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotLong")
      s"""
         |java.lang.Long $tmp = graft.functions.expr.SimilarityKernels.dotLongBoxed($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** SQ8 encode (vector, mins, maxs) → array<long> codes — codegen-native
  * twin of the ArrayTransform chain (see [[SimilarityKernels.sqEncode]]).
  * Handles array<float> and array<double> vectors (the float path widens
  * exactly, as the HOF's cast did). */
case class SqEncode(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)
  override def prettyName: String = "graft_sq_encode"
  private def floatElems: Boolean = first.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(v: Any, mins: Any, maxs: Any): Any =
    SimilarityKernels.sqEncode(v.asInstanceOf[ArrayData],
      mins.asInstanceOf[ArrayData], maxs.asInstanceOf[ArrayData], floatElems)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, mins, maxs) =>
      s"graft.functions.expr.SimilarityKernels.sqEncode($v, $mins, $maxs, $floatElems)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(f, s, t)
}

/** Equal-position count over two array<long> vectors — codegen-native. */
case class MatchCountLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_match_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimilarityKernels.matchCountLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.SimilarityKernels.matchCountLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** |A∩B| count over two sorted distinct array<long> (hashed shingles). */
case class IntersectSortedLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_intersect_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimilarityKernels.intersectSortedLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.SimilarityKernels.intersectSortedLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Column-level entry points. */
object SimilarityExpressions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def cosineSim(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  def dotProduct(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def jaccardDistinct(a: Column, b: Column): Column = c(JaccardDistinct(e(a), e(b)))
  def jaccardSortedLong(a: Column, b: Column): Column = c(JaccardSortedLong(e(a), e(b)))
  def intersectSortedLong(a: Column, b: Column): Column = c(IntersectSortedLong(e(a), e(b)))
  def dotLong(a: Column, b: Column): Column = c(DotLong(e(a), e(b)))
  def matchCountLong(a: Column, b: Column): Column = c(MatchCountLong(e(a), e(b)))
  def sqEncode(v: Column, mins: Column, maxs: Column): Column =
    c(SqEncode(e(v), e(mins), e(maxs)))
  def jaroWinkler(a: Column, b: Column): Column = c(JaroWinkler(e(a), e(b)))
  def nearestCentroidId(v: Column, cents: Array[Double], ids: Array[Long], dim: Int): Column =
    c(NearestCentroidId(e(v), cents, ids, dim))
  def probeCentroidIds(qv: Column, cents: Array[Double], ids: Array[Long],
      dim: Int, nprobe: Int): Column = c(ProbeCentroidIds(e(qv), cents, ids, dim, nprobe))
}
