package graft.functions

import graft.SparkSpecBase
import graft.functions.expr.DedupExpressions
import graft.queries.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The codegen-native shingle/gram-hash kernels (r18: they replaced the
  * interpreted Sequence/ArrayTransform HOF chains in the dedup family's
  * per-document prep — q28/q29/q30/q84/q89/q100/q115/q136/q177/q179/
  * q182/q183 and the streaming substring gate) must be EXACT twins of
  * the HOF formulations they replaced, including the edges the corpus
  * never exercises: docs shorter than k, repeated tokens/shingles
  * (array_distinct first-occurrence order), empty and null token
  * arrays, and null tokens (xxhash64 ignores a null input and returns
  * its seed 42; crossHash60 maps null → null element). */
class ShingleKernelParitySpec extends SparkSpecBase {
  import spark.implicits._

  // the HOF chains exactly as the query code wrote them pre-r18
  private def hofXxShingles(toks: Column, k: Int): Column =
    array_sort(array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => xxhash64(concat_ws(" ", (0 until k).map(o => element_at(toks, i + o + 1)): _*))))
        .otherwise(transform(toks, tk => xxhash64(tk)))))

  private def hofCrossShingles(toks: Column, k: Int, sorted: Boolean): Column = {
    val t = transform(Dedup.shinglesK(toks, k), sh => graft.QueryDsl.crossHash60(sh))
    if (sorted) array_sort(t) else t
  }

  private def hofCrossGrams(t: Column, l: Int): Column =
    when(size(t) >= l,
      transform(sequence(lit(0), size(t) - l),
        i => graft.QueryDsl.crossHash60(concat_ws(" ", slice(t, i + 1, lit(l))))))
      .otherwise(array().cast("array<bigint>"))

  private def hofHashAll(arr: Column): Column =
    transform(arr, w => graft.QueryDsl.crossHash60(w))

  private val rng = new scala.util.Random(7)
  private val vocab = Vector("the", "a", "dog", "cat", "ran", "sat", "on", "mat", "x", "yy")
  private def doc(n: Int): Seq[String] = Seq.fill(n)(vocab(rng.nextInt(vocab.size)))

  // lengths straddle every k in use (2, 3, 4, 8) including 0 and 1;
  // heavy repetition forces distinct-dedup and hash-order edges
  private def corpus(): Seq[Seq[String]] =
    (0 to 200).map(i => doc(i % 23)) ++ Seq(Seq.empty[String])

  private def assertParity(df: org.apache.spark.sql.DataFrame,
      kernel: Column, hof: Column): Unit = {
    val diffs = df.select(kernel.as("k"), hof.as("h"))
      .where(!(col("k") <=> col("h"))).count()
    assert(diffs == 0)
  }

  test("xxShinglesK == sorted-distinct xxhash64 HOF chain (k = 2 and 4)") {
    val df = corpus().toDF("toks")
    assertParity(df, DedupExpressions.xxShinglesK(col("toks"), 2), hofXxShingles(col("toks"), 2))
    assertParity(df, DedupExpressions.xxShinglesK(col("toks"), 4), hofXxShingles(col("toks"), 4))
  }

  test("xxShinglesK: null token array nulls through; null token hashes to the xxhash64 seed") {
    val df = Seq(
      (1, null.asInstanceOf[Seq[String]]),
      (2, Seq[String](null, "a")), // <k branch: xxhash64(null) = seed 42, kept once by distinct
      (3, Seq[String](null)),
      (4, Seq[String]("a", null, "b")) // >=k branch: concat_ws skips the null inside windows
    ).toDF("id", "toks")
    assertParity(df, DedupExpressions.xxShinglesK(col("toks"), 3), hofXxShingles(col("toks"), 3))
    assertParity(df, DedupExpressions.xxShinglesK(col("toks"), 2), hofXxShingles(col("toks"), 2))
  }

  test("crossShinglesK == transform(shinglesK, crossHash60) (k = 2/3/8, sorted and unsorted)") {
    val df = corpus().toDF("toks")
    for (k <- Seq(2, 3, 8); sorted <- Seq(true, false))
      assertParity(df, DedupExpressions.crossShinglesK(col("toks"), k, sorted),
        hofCrossShingles(col("toks"), k, sorted))
  }

  test("crossShinglesK: null tokens — null element in place (<k), skipped inside windows (>=k)") {
    val df = Seq(
      (1, null.asInstanceOf[Seq[String]]),
      (2, Seq[String]("a", null)), // <k=3: distinct keeps the null at its position; hash → null
      (3, Seq[String](null, null, "a")),
      (4, Seq[String]("a", null, "b", "c")) // >=k: windows concat_ws-skip the null
    ).toDF("id", "toks")
    for (sorted <- Seq(true, false))
      assertParity(df, DedupExpressions.crossShinglesK(col("toks"), 3, sorted),
        hofCrossShingles(col("toks"), 3, sorted))
  }

  test("crossGramsK == per-position L-gram crossHash60 HOF (guard folded into the kernel)") {
    val df = corpus().toDF("t")
    for (l <- Seq(2, 8))
      assertParity(df, DedupExpressions.crossGramsK(col("t"), l), hofCrossGrams(col("t"), l))
    // null array: kernel nulls through, HOF's otherwise(array()) yields
    // empty — both produce ZERO rows under the posexplode consumers,
    // which is the grain the queries read them at
    val nullDf = Seq((1, null.asInstanceOf[Seq[String]])).toDF("id", "t")
    val kRows = nullDf.select(posexplode(DedupExpressions.crossGramsK(col("t"), 3))).count()
    val hRows = nullDf.select(posexplode(hofCrossGrams(col("t"), 3))).count()
    assert(kRows == 0 && hRows == 0)
  }

  test("crossHash60All == transform(arr, crossHash60), null elements hash to null") {
    val df = (corpus() ++ Seq(Seq[String]("a", null, "b"), null)).toDF("arr")
    assertParity(df, DedupExpressions.crossHash60All(col("arr")), hofHashAll(col("arr")))
  }
}
