package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming twin of q114 (bloom-prefiltered incremental span dedup) —
  * the crawl-ingest shape: documents ARRIVE as a stream and must be
  * checked against a large static base corpus without re-shuffling the
  * base per micro-batch.
  *
  * Entirely STATELESS: the base is summarized once at query
  * construction into (a) a BloomFilter sketch over its 8-token span
  * hashes, which rides into the stream-side generated code as a
  * reference object, and (b) a persisted distinct span relation for
  * the exact confirm. Each arriving doc's spans prefilter through the
  * sketch INSIDE the row (no explode of non-candidates), and only
  * candidates flow into a stream-static inner join with the base span
  * relation — so per-batch work is proportional to candidate hits,
  * the output is exact (bloom has no false negatives; the join removes
  * its false positives), and there is NO streaming state to grow,
  * checkpoint, or time out. Append-mode, exactly-once under replay
  * (same input batch → same hits).
  *
  * At 100 TB the static side is a bucketed/pre-partitioned span table
  * so the per-batch join never re-shuffles it; the sketch shards by
  * span-hash range exactly as in the batch operator (SCALE.md
  * "Incremental ingest").
  */
object StreamingBloomIngest {

  /** @param docs     streaming (doc_id, text)
    * @param baseDocs static base corpus with `doc_id` and `text`
    * @return streaming confirmed contamination hits (doc_id, span) —
    *         one row per batch-doc span that exists verbatim in the
    *         base (append mode, stateless) */
  def contaminatedSpans(docs: Dataset[(Long, String)], baseDocs: DataFrame,
      fpp: Double = 0.01): DataFrame = {
    import graft.functions.expr.BloomExpressions.bloomMightContainLong
    def spans(tokens: org.apache.spark.sql.Column) =
      array_distinct(graft.functions.expr.TextExpressions.spanJoin(tokens, 8))
    def withSpans(df: DataFrame): DataFrame = df
      .withColumn("_t", split(col("text"), " "))
      .where(size(col("_t")) >= 8)
      .select(col("doc_id"), spans(col("_t")).as("_sp"))

    // Static index build, once per query: sized from a light row count
    // (q114's rule — over/under-sizing only moves the fp rate).
    val baseSpans = withSpans(baseDocs)
      .select(explode(col("_sp")).as("span")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nItems = math.max(baseDocs.count() * 256L, 1000L)
    val bloom = baseSpans.select(xxhash64(col("span")).as("h"))
      .stat.bloomFilter("h", nItems, fpp)

    // r19: in-row kernel probe (same hash/sketch semantics as the batch
    // twin — see BloomKernelParitySpec), not an interpreted ArrayFilter
    val cand = withSpans(docs.toDF("doc_id", "text"))
      .select(col("doc_id"),
        explode(graft.functions.expr.BloomExpressions.bloomFilterSpans(
          col("_sp"), Array(bloom))).as("span"))
    cand.join(baseSpans, Seq("span")) // stream-static inner: exact confirm
      .select(col("doc_id"), col("span"))
  }
}
