package graft.functions

import graft.SparkSpecBase
import graft.functions.expr.TextExpressions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The codegen-native text-structure kernels (r18 batch 2: they replace
  * the interpreted Sequence/ArrayTransform HOF chains in the bigram-LM
  * family's per-document prep — q88/q101/q191 bigram pairs, q78's
  * sliding 8-token spans, and the q185/q186/q190 strided line/paragraph
  * chunking) must be EXACT twins of the HOF formulations they replaced,
  * including edges the corpus never exercises: null tokens (element_at
  * propagates null fields; array_join/concat_ws skip nulls), partial
  * tail chunks, and heavy repetition. Callers guard the degenerate
  * domains (size >= 2 / size >= k / size >= 1) exactly as the HOF call
  * sites did. */
class TextKernelParitySpec extends SparkSpecBase {
  import spark.implicits._

  // the HOF chains exactly as the query code wrote them pre-batch-2
  private def hofBigramPairs(t: Column): Column =
    transform(sequence(lit(0), size(t) - 2),
      i => struct(element_at(t, i + 1).as("w1"), element_at(t, i + 2).as("w2")))

  private def hofSpanJoin(t: Column, k: Int): Column =
    transform(sequence(lit(0), size(t) - k),
      i => array_join(slice(t, i + 1, lit(k)), " "))

  private def hofChunkJoin(w: Column, k: Int): Column =
    transform(
      sequence(lit(0), floor((size(w) - 1) / lit(k.toDouble)).cast(IntegerType)),
      i => concat_ws(" ", slice(w, i * k + 1, lit(k))))

  private val rng = new scala.util.Random(11)
  private val vocab = Vector("the", "a", "dog", "cat", "ran", "sat", "on", "mat", "x", "yy")
  private def doc(n: Int): Seq[String] = Seq.fill(n)(vocab(rng.nextInt(vocab.size)))

  // lengths straddle every k in use (2, 4, 8, 12) with heavy repetition
  private def corpus(minLen: Int): Seq[Seq[String]] =
    (0 to 200).map(i => doc(minLen + i % 29))

  private def assertParity(df: org.apache.spark.sql.DataFrame,
      kernel: Column, hof: Column): Unit = {
    val diffs = df.select(kernel.as("k"), hof.as("h"))
      .where(!(col("k") <=> col("h"))).count()
    assert(diffs == 0)
  }

  test("bigramPairs == transform(sequence, struct(element_at)) on random corpora") {
    val df = corpus(minLen = 2).toDF("toks")
    assertParity(df, TextExpressions.bigramPairs(col("toks")), hofBigramPairs(col("toks")))
  }

  test("bigramPairs: null tokens propagate to null struct fields; short docs empty") {
    val withNulls = Seq(
      Seq[String]("a", null, "b"),
      Seq[String](null, null),
      Seq[String]("a", "b", null)).toDF("toks")
    assertParity(withNulls, TextExpressions.bigramPairs(col("toks")), hofBigramPairs(col("toks")))
    // callers guard size >= 2; below it the kernel returns an empty array
    val short = Seq(Seq.empty[String], Seq("only")).toDF("toks")
    val n = short.select(TextExpressions.bigramPairs(col("toks")).as("p"))
      .where(size(col("p")) =!= 0).count()
    assert(n == 0)
  }

  test("spanJoin == transform(sequence, array_join(slice)) (k = 2, 4, 8)") {
    for (k <- Seq(2, 4, 8)) {
      val df = corpus(minLen = k).toDF("toks")
      assertParity(df, TextExpressions.spanJoin(col("toks"), k), hofSpanJoin(col("toks"), k))
    }
  }

  test("spanJoin: array_join skips null tokens inside a window; short docs empty") {
    val withNulls = Seq(
      Seq[String]("a", null, "b", "c"),
      Seq[String](null, null, "x"),
      Seq[String]("a", "b", null)).toDF("toks")
    assertParity(withNulls, TextExpressions.spanJoin(col("toks"), 3),
      hofSpanJoin(col("toks"), 3))
    val short = Seq(Seq.empty[String], Seq("a"), Seq("a", "b")).toDF("toks")
    val n = short.select(TextExpressions.spanJoin(col("toks"), 3).as("p"))
      .where(size(col("p")) =!= 0).count()
    assert(n == 0)
  }

  test("chunkJoin == the Curation16.chunk HOF (k = 4 and 12, partial tails)") {
    for (k <- Seq(4, 12)) {
      val df = corpus(minLen = 1).toDF("toks")
      assertParity(df, TextExpressions.chunkJoin(col("toks"), k), hofChunkJoin(col("toks"), k))
    }
  }

  private def hofPostings(toks: Column, qterms: Column): Column =
    transform(array_intersect(qterms, toks),
      t => struct(t.as("term"),
        size(filter(toks, x => x === t)).cast("long").as("tf")))

  test("postings == transform(array_intersect, struct(size(filter))) incl. null tokens") {
    val qterms = Seq("a", "dog", "mat", "zz").sorted
    val df = (corpus(minLen = 0) ++ Seq(
      Seq[String]("a", null, "dog", "a"),
      Seq[String](null, null),
      Seq.empty[String])).toDF("toks")
      .withColumn("_q", typedLit(qterms))
    assertParity(df, TextExpressions.postings(col("toks"), col("_q")),
      hofPostings(col("toks"), col("_q")))
  }

  test("termFreqs == per-term size(filter(toks, x === lit(term))) incl. null tokens") {
    val terms = Seq("join", "dog", "a", "nosuch")
    val df = (corpus(minLen = 0) ++ Seq(
      Seq[String]("a", null, "a"),
      Seq.empty[String])).toDF("toks")
    val kernel = TextExpressions.termFreqs(col("toks"), terms)
    val hof = array(terms.map(tm =>
      size(filter(col("toks"), x => x === lit(tm))).cast("long")): _*)
    assertParity(df, kernel, hof)
  }

  test("chunkJoin: null tokens skipped by concat_ws; n=0 replicates the HOF's sequence(0,-1)") {
    val withNulls = Seq(
      Seq[String]("a", null, "b", "c", "d"),
      Seq[String](null, "x"),
      Seq[String]("lone")).toDF("toks")
    assertParity(withNulls, TextExpressions.chunkJoin(col("toks"), 4),
      hofChunkJoin(col("toks"), 4))
    val empty = Seq(Seq.empty[String]).toDF("toks")
    assertParity(empty, TextExpressions.chunkJoin(col("toks"), 4),
      hofChunkJoin(col("toks"), 4))
  }
}
