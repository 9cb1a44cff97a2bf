package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The in-row content-defined chunking kernel
  * ([[graft.functions.expr.DedupKernels.cdcChunks]], r19) must be an
  * EXACT twin of the q113 chain it replaced — posexplode →
  * boundary flag → per-doc prefix-count window → groupBy(doc, idx)
  * collect_list/array_sort/array_join — because q113's oracle compares
  * the chunk STRINGS bit-for-bit. Parity is asserted on the full
  * (doc_id, chunk) multiset, so chunk content, chunk count, and
  * per-doc membership all pin.
  */
class CdcChunksParitySpec extends SparkSpecBase {
  import spark.implicits._
  import graft.QueryDsl.crossHash60

  /** The replaced formulation, verbatim from r18 q113. */
  private def windowChunks(docs: DataFrame, m: Int): DataFrame = {
    val tok = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .withColumn("bnd", when(pmod(crossHash60(col("w")), lit(m)) === 0, 1L).otherwise(0L))
    val wCum = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    tok
      .withColumn("chunk_idx", coalesce(sum(col("bnd")).over(wCum), lit(0L)))
      .groupBy("doc_id", "chunk_idx")
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        x => x.getField("w")), " ").as("chunk"))
      .select("doc_id", "chunk")
  }

  private def kernelChunks(docs: DataFrame, m: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.expr.DedupExpressions.cdcChunks(
        split(col("text"), " "), m)).as("chunk"))

  private def assertSame(docs: DataFrame, m: Int): Unit = {
    val a = kernelChunks(docs, m).collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq
    val b = windowChunks(docs, m).collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq
    assert(a === b)
  }

  private def corpus(seed: Int, nDocs: Int, maxToks: Int): DataFrame = {
    val rng = new scala.util.Random(seed)
    val vocab = (1 to 120).map(i => s"w$i")
    (1 to nDocs).map { i =>
      val n = 1 + rng.nextInt(maxToks)
      (i.toLong, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("randomized corpus, production modulus 16: chunk multisets identical") {
    assertSame(corpus(42, 300, 40).repartition(7), 16)
  }

  test("dense boundaries (mod 2): single-token chunks and runs agree") {
    assertSame(corpus(7, 150, 25), 2)
  }

  test("degenerate docs: empty text, single token, all-boundary tail") {
    // find a vocab word that IS a boundary at mod 4 so the
    // boundary-token-closes-chunk and trailing-run edges both occur
    val boundary = (1 to 500).map(i => s"w$i")
      .find(w => graft.functions.expr.DedupKernels.crossHash60One(
        org.apache.spark.unsafe.types.UTF8String.fromString(w)) % 4 == 0).get
    val docs = Seq(
      (1L, ""),                                  // split -> [""]
      (2L, boundary),                            // lone boundary token
      (3L, s"a b $boundary"),                    // boundary closes the doc
      (4L, s"$boundary a b"),                    // boundary opens the doc
      (5L, s"$boundary $boundary $boundary"),    // every token a chunk
      (6L, "plain run with no boundary at all")
    ).toDF("doc_id", "text")
    assertSame(docs, 4)
  }

  test("the q113 registry query itself is oracle-shaped after the rewrite") {
    // smoke: runs end-to-end on the spec corpus and keeps its schema
    val df = graft.SparkEntry.queries("q113_cdc_chunks")(spark, sfDir)
    assert(df.columns.toSeq === Seq("chunk", "n_docs", "first_doc"))
    assert(df.count() >= 0)
  }
}
