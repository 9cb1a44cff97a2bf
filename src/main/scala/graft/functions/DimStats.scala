package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder

/** One-pass per-dimension min/max over a vector column — the SQ8
  * trainer's statistics aggregate (see
  * [[graft.queries.Curation5.sqStats]]).
  *
  * The shape it replaces — `posexplode(embedding)` into (dim, x) rows
  * followed by `groupBy(dim).agg(min, max)` and a second
  * collect_list/array_sort/transform aggregate to assemble the dim-
  * ordered arrays — multiplies every corpus row 64× through a Generate
  * and probes a per-task hash map once per element before the partial
  * aggregate even ships, then pays a second exchange+aggregate layer
  * (interpreted `transform` lambdas) to rebuild arrays from rows. This
  * aggregator folds each row's array into two parallel float arrays in
  * straight-line code, ships ONE (mins, maxs) partial per task, and
  * emits the dim-ordered arrays directly: same two-stage global
  * aggregate, no explode, no second aggregate layer.
  *
  * Semantics are the exact twin of the min/max-over-posexplode chain:
  *  - null input arrays are skipped (posexplode emits nothing for them);
  *  - element comparisons are Spark's nan-safe float ordering (NaN
  *    greatest, otherwise primitive compare), i.e. `Min`/`Max` over
  *    FloatType;
  *  - rows of differing lengths contribute to the dims they have
  *    (positions are a dense prefix, so every dim below the longest
  *    seen row is populated);
  *  - the per-dim min/max are computed AS FLOATS and cast to double
  *    only on output (exact), matching `min(x)`/`max(x)` over the
  *    exploded float column followed by the final `.cast(DoubleType)`;
  *  - an empty input yields empty arrays (collect_list over zero rows).
  */
object DimStats {

  /** Parallel per-dim extrema; empty until the first non-null row. */
  final case class MM(var mins: Array[Double], var maxs: Array[Double])

  // Spark's nan-safe orderings, specialized to the two updates: NaN is
  // GREATER than everything (so it never wins a min slot unless the
  // slot holds NaN, and always wins a max slot). Computed over DOUBLES:
  // the input column is cast to ARRAY<DOUBLE> at the call site — exact
  // for float sources (widening), identity for double sources (the 10x
  // stress generator's embeddings) — and min/max commute with exact
  // widening, so the float-source result is bit-identical to the
  // FloatType min/max chain this replaces.
  private def minOf(a: Double, b: Double): Double =
    if (java.lang.Double.isNaN(a)) b
    else if (java.lang.Double.isNaN(b)) a
    else if (b < a) b else a

  private def maxOf(a: Double, b: Double): Double =
    if (java.lang.Double.isNaN(a)) a
    else if (java.lang.Double.isNaN(b)) b
    else if (b > a) b else a

  private def grow(b: MM, n: Int): Unit = {
    if (n > b.mins.length) {
      b.mins = java.util.Arrays.copyOf(b.mins, n)
      b.maxs = java.util.Arrays.copyOf(b.maxs, n)
    }
  }

  private class Agg extends Aggregator[Seq[Double], MM, (Seq[Double], Seq[Double])] {
    def zero: MM = MM(Array.emptyDoubleArray, Array.emptyDoubleArray)
    def reduce(b: MM, arr: Seq[Double]): MM = {
      if (arr == null) return b
      val old = b.mins.length
      grow(b, arr.length)
      var i = 0
      val n = arr.length
      while (i < n) {
        val x = arr(i)
        if (i < old) {
          b.mins(i) = minOf(b.mins(i), x)
          b.maxs(i) = maxOf(b.maxs(i), x)
        } else { b.mins(i) = x; b.maxs(i) = x }
        i += 1
      }
      b
    }
    def merge(b1: MM, b2: MM): MM = {
      val old = b1.mins.length
      grow(b1, b2.mins.length)
      var i = 0
      val n = b2.mins.length
      while (i < n) {
        if (i < old) {
          b1.mins(i) = minOf(b1.mins(i), b2.mins(i))
          b1.maxs(i) = maxOf(b1.maxs(i), b2.maxs(i))
        } else { b1.mins(i) = b2.mins(i); b1.maxs(i) = b2.maxs(i) }
        i += 1
      }
      b1
    }
    def finish(b: MM): (Seq[Double], Seq[Double]) = (b.mins.toSeq, b.maxs.toSeq)
    def bufferEncoder: Encoder[MM] = ExpressionEncoder[MM]()
    def outputEncoder: Encoder[(Seq[Double], Seq[Double])] =
      ExpressionEncoder[(Seq[Double], Seq[Double])]()
  }

  /** struct(_1 = mins: ARRAY<DOUBLE>, _2 = maxs: ARRAY<DOUBLE>).
    * Input must be ARRAY<DOUBLE> — cast the vector column at the call
    * site (exact for float sources; the 10x stress corpus is double). */
  val minMax: UserDefinedFunction = udaf(new Agg, ExpressionEncoder[Seq[Double]]())
}
