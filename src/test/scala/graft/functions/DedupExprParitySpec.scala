package graft.functions

import graft.SparkSpecBase
import graft.functions.expr.DedupExpressions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Native ArrayData kernels must be bit-identical to the plain-Scala
  * reference implementations (`*Impl`). The references are wrapped in
  * `udf()` HERE, test-locally — src/main exposes only the native
  * kernels, so this spec is the one place the slow twin still runs. */
class DedupExprParitySpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = graft.Tables(spark, sfDir).documents.limit(100)

  // Test-local udf wrappers over the reference impls.
  private val minHashLongRef = udf((sh: Seq[Long], k: Int) => DedupFunctions.minHashSigLongImpl(sh, k))
  private val minHashStrRef = udf((sh: Seq[String], k: Int) => DedupFunctions.minHashSigImpl(sh, k))
  private val bandRef = udf((sig: Seq[Long], bands: Int) => DedupFunctions.bandHashesImpl(sig, bands))
  private val simHashRef = udf(DedupFunctions.simHash64Impl _)
  private val langIdRef = udf(TextAnalysis.langIdImpl _)
  private val winnowRef = udf((t: String, k: Int, w: Int) => TextAnalysis.winnowImpl(t, k, w))
  private val hyperRef = udf((v: Seq[Double], bits: Int) => VectorFunctions.hyperplaneSigImpl(v, bits))
  private val sigBandsRef = udf((sig: Long, bands: Int, bits: Int) => VectorFunctions.sigBandsImpl(sig, bands, bits))

  test("minhash + band expressions match the reference implementations") {
    val t = split(col("text"), " ")
    val base = docs.select(col("doc_id"),
      array_sort(transform(graft.queries.Dedup.shingles2(t), x => xxhash64(x))).as("shh"))
    val diffs = base.select(
        DedupExpressions.minHashSig(col("shh"), 32).as("native"),
        minHashLongRef(col("shh"), lit(32)).as("ref"))
      .where(col("native") =!= col("ref")).count()
    assert(diffs == 0)
    val bandDiffs = base
      .withColumn("sig", DedupExpressions.minHashSig(col("shh"), 32))
      .select(
        DedupExpressions.bandHashes(col("sig"), 8).as("native"),
        bandRef(col("sig"), lit(8)).as("ref"))
      .where(col("native") =!= col("ref")).count()
    assert(bandDiffs == 0)
  }

  test("string-shingle minhash expression matches the reference implementation") {
    val base = docs.select(graft.queries.Dedup.shingles2(split(col("text"), " ")).as("sh"))
    val diffs = base.select(
        DedupExpressions.minHashSigStr(col("sh"), 32).as("native"),
        minHashStrRef(col("sh"), lit(32)).as("ref"))
      .where(col("native") =!= col("ref")).count()
    assert(diffs == 0)
    // and the public DedupFunctions.minHashSig entry point IS the kernel
    val viaApi = base.select(
        DedupFunctions.minHashSig(col("sh"), 32).as("api"),
        DedupExpressions.minHashSigStr(col("sh"), 32).as("native"))
      .where(col("api") =!= col("native")).count()
    assert(viaApi == 0)
  }

  test("simhash expression matches the reference implementation") {
    val diffs = docs.select(
        DedupExpressions.simHash64(split(col("text"), " ")).as("native"),
        simHashRef(split(col("text"), " ")).as("ref"))
      .where(col("native") =!= col("ref")).count()
    assert(diffs == 0)
  }

  test("langid + winnow expressions match the reference implementations") {
    val langDiffs = docs.select(
        graft.functions.expr.TextExpressions.langId(col("text")).as("native"),
        langIdRef(col("text")).as("ref"))
      .where(col("native.lang") =!= col("ref.lang") ||
             col("native.confidence") =!= col("ref.confidence")).count()
    assert(langDiffs == 0)
    val winnowDiffs = docs.select(
        graft.functions.expr.TextExpressions.winnow(col("text"), 8, 4).as("native"),
        winnowRef(col("text"), lit(8), lit(4)).as("ref"))
      .where(col("native") =!= col("ref")).count()
    assert(winnowDiffs == 0)
  }

  test("hyperplane signature + fp bands match the reference implementations") {
    val e = graft.Tables(spark, sfDir).embeddings.limit(100)
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
    val diffs = e.select(
        DedupExpressions.hyperplaneSig(col("v"), 16).as("native"),
        hyperRef(col("v"), lit(16)).as("ref"))
      .where(col("native") =!= col("ref")).count()
    assert(diffs == 0)
    val bandDiffs = e
      .withColumn("sig", DedupExpressions.hyperplaneSig(col("v"), 16))
      .select(
        DedupExpressions.fpBands(col("sig"), 4, 4).as("native"),
        sigBandsRef(col("sig"), lit(4), lit(16)).as("ref"))
      .where(col("native") =!= col("ref")).count()
    assert(bandDiffs == 0)
  }
}
