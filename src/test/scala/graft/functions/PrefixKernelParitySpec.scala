package graft.functions

import graft.SparkSpecBase
import graft.functions.expr.{DedupExpressions, DedupKernels}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The PPJoin df-ordered prefix kernel (r19: replaced the
  * `row_number() OVER (PARTITION BY doc_id ORDER BY df, sh)` window
  * over the exploded shingle stream in [[graft.queries.Dedup]]'s
  * allPairsJaccardOn / crossCorpusJaccardOn) must reproduce the window
  * formulation's (sh, doc_id, sz, rk) rows bit-for-bit: same (df ASC,
  * sh ASC) order, same `rk <= sz - ceil(t*sz) + 1` cut, including df
  * ties broken by sh, single-shingle docs, thresholds 0/0.4/0.5/1.0,
  * and negative hash values. */
class PrefixKernelParitySpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(19)

  /** Random (doc_id, shh) corpus; small hash space forces heavy df
    * collisions (the tie-break edge), negative values included. */
  private def corpus(nDocs: Int, maxLen: Int, hashSpace: Int): DataFrame = {
    val rows = (0 until nDocs).map { id =>
      val n = rng.nextInt(maxLen + 1)
      val sh = Seq.fill(n)(rng.nextLong() % hashSpace).distinct
      (id.toLong, sh)
    }
    rows.toDF("doc_id", "shh")
  }

  /** The window formulation exactly as allPairsJaccardOn wrote it pre-r19. */
  private def windowPrefix(d: DataFrame, threshold: Double): DataFrame = {
    val dfreq = d.select(explode(col("shh")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    d.select(col("doc_id"), size(col("shh")).as("sz"), explode(col("shh")).as("sh"))
      .join(dfreq, Seq("sh"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")) + lit(1))
      .select(col("sh"), col("doc_id"), col("sz"), col("rk"))
  }

  /** The kernel formulation exactly as allPairsJaccardOn writes it now. */
  private def kernelPrefix(d: DataFrame, threshold: Double): DataFrame = {
    val dfreq = d.select(explode(col("shh")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
    d.select(col("doc_id"), explode(col("shh")).as("sh"))
      .join(dfreq, Seq("sh"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("df"), col("sh"))).as("_e"))
      .select(col("doc_id"), size(col("_e")).as("sz"),
        posexplode(DedupExpressions.prefixByDf(col("_e"), threshold))
          .as(Seq("_pos", "sh")))
      .select(col("sh"), col("doc_id"), col("sz"), (col("_pos") + lit(1)).as("rk"))
  }

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema.map(f => (f.name, f.dataType)) ===
      b.schema.map(f => (f.name, f.dataType)))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("kernel prefix == window prefix on a random heavy-collision corpus (t = 0.4 and 0.5)") {
    val d = corpus(nDocs = 120, maxLen = 40, hashSpace = 50)
    for (t <- Seq(0.4, 0.5))
      assertSameRows(kernelPrefix(d, t), windowPrefix(d, t))
  }

  test("kernel prefix == window prefix with unique hashes (df all 1, order = sh) and wide hashes") {
    val d = corpus(nDocs = 60, maxLen = 25, hashSpace = Int.MaxValue)
    assertSameRows(kernelPrefix(d, 0.4), windowPrefix(d, 0.4))
  }

  test("edge thresholds: t = 1.0 keeps exactly rank 1; t = 0.0 keeps every shingle") {
    val d = corpus(nDocs = 40, maxLen = 12, hashSpace = 30)
    assertSameRows(kernelPrefix(d, 1.0), windowPrefix(d, 1.0))
    assertSameRows(kernelPrefix(d, 0.0), windowPrefix(d, 0.0))
    val perDoc = kernelPrefix(d, 1.0).groupBy("doc_id").count().select("count")
      .as[Long].collect()
    assert(perDoc.forall(_ == 1L))
  }

  test("single-shingle and empty docs: one prefix row / no rows, matching the window") {
    val d = Seq((1L, Seq(42L)), (2L, Seq.empty[Long]), (3L, Seq(-7L, 42L)))
      .toDF("doc_id", "shh")
    for (t <- Seq(0.4, 1.0))
      assertSameRows(kernelPrefix(d, t), windowPrefix(d, t))
  }

  test("kernel sorts by (df, sh) with sh tie-break and clamps p to [0, n]") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.catalyst.InternalRow
    def entries(pairs: (Long, Long)*): ArrayData =
      new GenericArrayData(pairs.map { case (df, sh) =>
        InternalRow(df, sh): Any }.toArray)
    // df ties break on sh; negative sh sorts first
    val e = entries((2L, 5L), (1L, 9L), (1L, -3L), (2L, 1L))
    val full = DedupKernels.prefixByDf(e, 0.0).toLongArray()
    assert(full.toSeq == Seq(-3L, 9L, 1L, 5L))
    // t=1: p = n - n + 1 = 1
    assert(DedupKernels.prefixByDf(e, 1.0).toLongArray().toSeq == Seq(-3L))
    // empty input
    assert(DedupKernels.prefixByDf(entries(), 0.4).numElements() == 0)
  }
}
