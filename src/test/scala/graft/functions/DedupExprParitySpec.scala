package graft.functions

import graft.SparkSpecBase
import graft.functions.expr.DedupExpressions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Native ArrayData kernels must be bit-identical to the UDF
  * formulations they replaced (the UDF impls stay as the reference
  * twins, exercised by PropertySpec/DedupSpec). */
class DedupExprParitySpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = graft.Tables(spark, sfDir).documents.limit(100)

  test("minhash + band expressions match the UDF implementations") {
    val t = split(col("text"), " ")
    val base = docs.select(col("doc_id"),
      array_sort(transform(graft.queries.Dedup.shingles2(t), x => xxhash64(x))).as("shh"))
    val diffs = base.select(
        DedupExpressions.minHashSig(col("shh"), 32).as("native"),
        DedupFunctions.minHashSigLong(col("shh"), 32).as("viaUdf"))
      .where(col("native") =!= col("viaUdf")).count()
    assert(diffs == 0)
    val bandDiffs = base
      .withColumn("sig", DedupExpressions.minHashSig(col("shh"), 32))
      .select(
        DedupExpressions.bandHashes(col("sig"), 8).as("native"),
        DedupFunctions.bandHashes(col("sig"), 8).as("viaUdf"))
      .where(col("native") =!= col("viaUdf")).count()
    assert(bandDiffs == 0)
  }

  test("simhash expression matches the UDF implementation") {
    val diffs = docs.select(
        DedupExpressions.simHash64(split(col("text"), " ")).as("native"),
        DedupFunctions.simHash64(split(col("text"), " ")).as("viaUdf"))
      .where(col("native") =!= col("viaUdf")).count()
    assert(diffs == 0)
  }

  test("langid + winnow expressions match the UDF implementations") {
    val langDiffs = docs.select(
        graft.functions.expr.TextExpressions.langId(col("text")).as("native"),
        TextAnalysis.langId(col("text")).as("viaUdf"))
      .where(col("native.lang") =!= col("viaUdf.lang") ||
             col("native.confidence") =!= col("viaUdf.confidence")).count()
    assert(langDiffs == 0)
    val winnowDiffs = docs.select(
        graft.functions.expr.TextExpressions.winnow(col("text"), 8, 4).as("native"),
        TextAnalysis.winnow(col("text"), 8, 4).as("viaUdf"))
      .where(col("native") =!= col("viaUdf")).count()
    assert(winnowDiffs == 0)
  }

  test("hyperplane signature + fp bands match the UDF implementations") {
    val e = graft.Tables(spark, sfDir).embeddings.limit(100)
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
    val diffs = e.select(
        DedupExpressions.hyperplaneSig(col("v"), 16).as("native"),
        VectorFunctions.hyperplaneSig(col("v"), 16).as("viaUdf"))
      .where(col("native") =!= col("viaUdf")).count()
    assert(diffs == 0)
    val bandDiffs = e
      .withColumn("sig", DedupExpressions.hyperplaneSig(col("v"), 16))
      .select(
        DedupExpressions.fpBands(col("sig"), 4, 4).as("native"),
        VectorFunctions.sigBands(col("sig"), 4, 16).as("viaUdf"))
      .where(col("native") =!= col("viaUdf")).count()
    assert(bandDiffs == 0)
  }
}
