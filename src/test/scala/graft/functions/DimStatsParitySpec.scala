package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The one-pass SQ8 trainer aggregate ([[DimStats.minMax]], r19) must be
  * an EXACT twin of the posexplode → groupBy(dim) min/max →
  * collect_list/array_sort/transform chain it replaced in
  * [[graft.queries.Curation5.sqStats]] — the stats feed sqEncode in 13
  * SQ8-family queries whose oracles check integer dots bit-exactly, so
  * any drift here is an oracle break, not a perf bug. */
class DimStatsParitySpec extends SparkSpecBase {
  import spark.implicits._

  /** The replaced formulation, verbatim from r18 sqStats. */
  private def hofStats(df: DataFrame): DataFrame =
    df.select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mn")))),
          e => e.getField("mn").cast(DoubleType)).as("mins"),
        transform(array_sort(collect_list(struct(col("dim"), col("mx")))),
          e => e.getField("mx").cast(DoubleType)).as("maxs"))

  /** Production entry (sqStats' exact call shape): the aggregate is
    * double-typed and the vector column is cast at the call site —
    * exact widening for float corpora, identity for double corpora
    * (the 10x stress generator emits ARRAY<DOUBLE> embeddings, which
    * the float-typed r19 first cut crashed on). */
  private def aggStats(df: DataFrame): DataFrame =
    df.agg(DimStats.minMax(col("embedding").cast("array<double>")).as("_mm"))
      .select(col("_mm._1").as("mins"), col("_mm._2").as("maxs"))

  /** Element equality with ALL NaNs equal: boxed-Double Seq equality
    * compares raw bit patterns, and the two formulations can surface
    * NaN payloads with different bits — indistinguishable in every
    * downstream IEEE op (sqEncode arithmetic), so not a drift. */
  private def sameVals(a: Seq[Double], b: Seq[Double]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) =>
      x == y || (x.isNaN && y.isNaN)
    }

  private def assertSame(df: DataFrame): Unit = {
    val h = hofStats(df).collect().head
    val k = aggStats(df).collect().head
    assert(sameVals(k.getSeq[Double](0), h.getSeq[Double](0)), "mins drifted")
    assert(sameVals(k.getSeq[Double](1), h.getSeq[Double](1)), "maxs drifted")
  }

  test("randomized float corpus: per-dim extrema and dim order are identical") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 500).map(i =>
      (i.toLong, Seq.fill(64)(rng.nextFloat() * 10f - 5f)))
    assertSame(rows.toDF("vec_id", "embedding").repartition(7))
  }

  test("constant dims, negative-only dims, and float-precision extremes survive") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val v = Seq.fill(16)(rng.nextFloat() * 1e6f - 5e5f)
        .updated(3, 1.25f)            // constant dim (mx == mn downstream)
        .updated(5, -rng.nextFloat()) // negative-only dim
      (i.toLong, v)
    }
    assertSame(rows.toDF("vec_id", "embedding").repartition(3))
  }

  test("null arrays are skipped like posexplode skips them") {
    val rows: Seq[(Long, Seq[Float])] = Seq(
      (1L, Seq(1f, 2f, 3f)), (2L, null), (3L, Seq(0f, -2f, 9f)))
    assertSame(rows.toDF("vec_id", "embedding"))
  }

  test("variable-length rows populate the dense dim prefix identically") {
    val rows = Seq(
      (1L, Seq(5f, -1f)),
      (2L, Seq(1f, 2f, 3f, 4f)),
      (3L, Seq(-9f)))
    assertSame(rows.toDF("vec_id", "embedding"))
  }

  test("NaN follows Spark's nan-safe float ordering (greatest: owns max, never min)") {
    val rows = Seq(
      (1L, Seq(1f, Float.NaN)),
      (2L, Seq(-3f, 2f)),
      (3L, Seq(0f, 7f)))
    assertSame(rows.toDF("vec_id", "embedding"))
  }

  test("empty corpus yields empty arrays in both formulations") {
    val df = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assertSame(df)
  }

  test("double-typed corpus (the 10x stress shape) aggregates without a cast error") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 300).map(i =>
      (i.toLong, Seq.fill(32)(rng.nextDouble() * 10 - 5)))
    assertSame(rows.toDF("vec_id", "embedding").repartition(5))
  }
}
