package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` embedding columns.
  *
  * Built from Spark's higher-order functions (zip_with/aggregate) so the
  * fold order is a deterministic left-to-right pass — bit-identical to
  * the DuckDB oracle's sequential loop, which is what lets q31/q33 be
  * hash-checked. The hot paths are the codegen kernels in
  * [[graft.functions.expr.SimilarityExpressions]]; the HOF forms stay
  * as cross-check twins (TextAndAnnSpec).
  */
object VectorFunctions {

  /** Native codegen kernels (graft.functions.expr) — the hot path. */
  def dot(a: Column, b: Column): Column = graft.functions.expr.SimilarityExpressions.dotProduct(a, b)

  /** cosine = dot / sqrt(|a|²·|b|²) — same formula and accumulation
    * order as DuckDB's list_cosine_similarity. */
  def cosineSim(a: Column, b: Column): Column = graft.functions.expr.SimilarityExpressions.cosineSim(a, b)

  /** Reference formulation via higher-order functions — kept as the
    * cross-check twin for the native kernel (see TextAndAnnSpec). */
  def cosineSimHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x) / sqrt(
      aggregate(a, lit(0.0), (acc, x) => acc + x * x) *
      aggregate(b, lit(0.0), (acc, x) => acc + x * x))

  /** Random-hyperplane signature (Charikar LSH): bit i of the result is
    * the sign of <v, r_i> where r_i is a deterministic pseudo-random
    * ±1 hyperplane derived from mix64 — no stored planes, any executor
    * recomputes them identically. Native codegen kernel. Reference
    * impl: [[hyperplaneSigImpl]] (parity in DedupExprParitySpec). */
  def hyperplaneSig(v: Column, bits: Int): Column =
    graft.functions.expr.DedupExpressions.hyperplaneSig(v, bits)

  def hyperplaneSigImpl(v: Seq[Double], bits: Int): Long = {
    var sig = 0L
    var i = 0
    while (i < bits) {
      var acc = 0.0
      var j = 0
      while (j < v.length) {
        val sign = if ((Hashing.mix64((i.toLong << 32) ^ j.toLong) & 1L) == 1L) 1.0 else -1.0
        acc += v(j) * sign
        j += 1
      }
      if (acc > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Split a `bits`-wide signature into `bands` chunk values for LSH
    * bucket joins. Native codegen kernel. */
  def sigBands(sig: Column, bands: Int, bits: Int): Column =
    graft.functions.expr.DedupExpressions.fpBands(sig, bands, bits / bands)

  def sigBandsImpl(sig: Long, bands: Int, bits: Int): Array[Long] = {
    val width = bits / bands
    val mask = (1L << width) - 1
    Array.tabulate(bands)(b => (sig >>> (b * width)) & mask)
  }
}
