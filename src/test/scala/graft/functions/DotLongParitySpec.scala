package graft.functions

import graft.SparkSpecBase
import graft.functions.expr.SimilarityExpressions
import org.apache.spark.sql.functions._

/** The codegen-native integer-dot / match-count kernels (r18: they
  * replaced interpreted aggregate(zip_with(...)) folds in the SQ8/ANN
  * scan loops — q121/q122/q123/q129/q135/q140/q147/q150/q153/q164 and
  * q177's signature-match count) must be EXACT twins of the HOF
  * formulations they replaced, including the null/length edge cases the
  * optimizer can't see: zip_with pads the shorter array with nulls, so
  * the dot goes NULL on mismatch while the when(x===y,1,0) match count
  * falls to 0 instead. */
class DotLongParitySpec extends SparkSpecBase {
  import spark.implicits._

  private def hofDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
    lit(0L), (acc, x) => acc + x)
  private def hofMatch = aggregate(zip_with(col("a"), col("b"),
    (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (acc, x) => acc + x)

  private val rng = new scala.util.Random(42)
  private def vec(n: Int): Seq[Long] = Seq.fill(n)(rng.nextInt(255).toLong - 127L)

  test("dotLong / matchCountLong match the HOF fold on randomized equal-width vectors") {
    val rows = (1 to 300).map { i => (vec(64), if (i % 3 == 0) vec(64) else vec(64)) }
    val df = rows.toDF("a", "b")
    val diffs = df.select(
        SimilarityExpressions.dotLong(col("a"), col("b")).as("nd"),
        hofDot.as("hd"),
        SimilarityExpressions.matchCountLong(col("a"), col("b")).as("nm"),
        hofMatch.as("hm"))
      .where(col("nd") =!= col("hd") || col("nm") =!= col("hm")).count()
    assert(diffs == 0)
  }

  test("length mismatch: dot goes null (zip_with pad), match count ignores the pad") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L, 5L))).toDF("a", "b")
    val r = df.select(
      SimilarityExpressions.dotLong(col("a"), col("b")).as("nd"),
      hofDot.as("hd"),
      SimilarityExpressions.matchCountLong(col("a"), col("b")).as("nm"),
      hofMatch.as("hm")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1)) // both formulations null
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L) // only index 0 matches
  }

  test("null element: dot goes null, match count treats it as non-match — both twins agree") {
    val df = Seq((Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 2L, 3L)))
      .toDF("a", "b")
    val r = df.select(
      SimilarityExpressions.dotLong(col("a"), col("b")).as("nd"),
      hofDot.as("hd"),
      SimilarityExpressions.matchCountLong(col("a"), col("b")).as("nm"),
      hofMatch.as("hm")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L)
  }

  private def hofSqCode(arr: org.apache.spark.sql.Column) =
    transform(arr, (x, i) => {
      val mn = element_at(col("mins"), i + 1)
      val mx = element_at(col("maxs"), i + 1)
      when(mx > mn,
        least(floor((x.cast("double") - mn) * lit(255.0) / (mx - mn)).cast("long"),
          lit(254L)) - lit(127L))
        .otherwise(lit(0L))
    })

  test("sqEncode kernel matches the transform-HOF encoder on float and double vectors") {
    // float vectors (the embeddings-table path) with a constant dim
    // (mx == mn → otherwise-0)
    val vecsF = (1 to 200).map(_ => Seq.fill(16)(rng.nextFloat() * 10f - 5f))
      .map(v => v.updated(3, 1.25f)) // dim 3 constant across corpus
    val dfF = vecsF.toDF("v")
    val minsF = (0 until 16).map(d => vecsF.map(_(d)).min.toDouble)
    val maxsF = (0 until 16).map(d => vecsF.map(_(d)).max.toDouble)
    val withStatsF = dfF
      .withColumn("mins", typedLit(minsF)).withColumn("maxs", typedLit(maxsF))
    val diffsF = withStatsF.select(
        graft.functions.expr.SimilarityExpressions
          .sqEncode(col("v"), col("mins"), col("maxs")).as("k"),
        hofSqCode(col("v")).as("h"))
      .where(col("k") =!= col("h")).count()
    assert(diffsF == 0)
    // double vectors (the Similarity.corpus path), full-length stats
    val vecsD = (1 to 200).map(_ => Seq.fill(16)(rng.nextDouble() * 4 - 2))
    val dfD = vecsD.toDF("v")
    val minsD = (0 until 16).map(d => vecsD.map(_(d)).min)
    val maxsD = (0 until 16).map(d => vecsD.map(_(d)).max)
    val withStatsD = dfD
      .withColumn("mins", typedLit(minsD)).withColumn("maxs", typedLit(maxsD))
    val diffsD = withStatsD.select(
        graft.functions.expr.SimilarityExpressions
          .sqEncode(col("v"), col("mins"), col("maxs")).as("k"),
        hofSqCode(col("v")).as("h"))
      .where(col("k") =!= col("h")).count()
    assert(diffsD == 0)
  }

  test("null / empty arrays propagate identically") {
    val df = Seq(
      (null.asInstanceOf[Seq[Long]], Seq(1L, 2L)),
      (Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    val rs = df.select(
      SimilarityExpressions.dotLong(col("a"), col("b")).as("nd"), hofDot.as("hd"),
      SimilarityExpressions.matchCountLong(col("a"), col("b")).as("nm")).collect()
    assert(rs(0).isNullAt(0) && rs(0).isNullAt(1) && rs(0).isNullAt(2))
    assert(rs(1).getLong(0) == 0L && rs(1).getLong(1) == 0L && rs(1).getLong(2) == 0L)
  }
}
