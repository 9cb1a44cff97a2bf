package graft.streaming

import graft.functions.expr.DedupExpressions
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental MinHash-LSH near-duplicate detection — the streaming
  * twin of q29, for crawl-frontier ingestion: each arriving document is
  * checked against previously seen documents that share an LSH band
  * bucket, and verified candidate pairs are emitted AS THE STREAM RUNS
  * instead of by re-scanning the corpus.
  *
  * State model: keyed by (band position, band hash) — the same bucket
  * structure as the batch operator, so work per document is
  * proportional to its bucket sizes, never corpus size. Each bucket
  * retains up to `maxBucket` (doc_id, shingle-hash set) entries; beyond
  * the cap, new docs still verify against the retained members but are
  * not added (the batch operator's degenerate-bucket guard, applied to
  * state growth — boilerplate-heavy buckets stop accumulating).
  *
  * Candidates are verified with the exact merge-walk Jaccard before
  * emission, so the output is exact similarity over LSH candidates —
  * identical semantics to q29's verify stage. A pair sharing several
  * bands emits from each; `candidatePairs` dedupes per-pair downstream
  * (pair-density-sized state, tiny relative to the corpus).
  */
object StreamingNearDup {

  final case class NearDupPair(a_id: Long, b_id: Long, jaccard: Double)

  // not `private`: Dataset/GroupState encoders generate accessor code
  // that needs public visibility of the case-class constructor
  final case class BucketDoc(docId: Long, shc: Array[Long])
  final case class BandRow(pos: Int, band: Long, docId: Long, shc: Array[Long])

  /** Exact Jaccard of two sorted distinct long arrays (merge walk). */
  private[streaming] def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter).toDouble
  }

  /** @param docs streaming (doc_id, text)
    * @return streaming verified pairs (a_id < b_id, jaccard ≥ threshold) */
  def candidatePairs(
      docs: Dataset[(Long, String)],
      k: Int = 32, bands: Int = 8, threshold: Double = 0.12,
      maxBucket: Int = 50): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val r = k / bands

    // per-doc prep with the batch kernels: sorted distinct 2-shingle
    // hashes and the banded minhash signature
    val prepped = docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        // codegen-native sorted-distinct xxhash64 2-shingles — the
        // SAME kernel as the batch minhash path (hash parity with
        // Dedup.minhashLshRels is what makes stream == batch buckets)
        DedupExpressions.xxShinglesK(col("toks"), 2).as("shc"))
      .withColumn("sig", DedupExpressions.minHashSig(col("shc"), k))
      .select(col("doc_id"), col("shc"),
        posexplode(DedupExpressions.bandHashes(col("sig"), bands)).as(Seq("pos", "band")))
      .as[(Long, Array[Long], Int, Long)]
      .map { case (id, shc, pos, band) => BandRow(pos, band, id, shc) }

    val pairs = prepped
      .groupByKey(r => (r.pos, r.band))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandRow], state: GroupState[List[BucketDoc]]) =>
          var bucket = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[NearDupPair]
          // deterministic order within a batch
          rows.toSeq.sortBy(_.docId).foreach { row =>
            bucket.foreach { prev =>
              if (prev.docId != row.docId) {
                val j = jaccardSorted(prev.shc, row.shc)
                if (j >= threshold)
                  out += NearDupPair(
                    math.min(prev.docId, row.docId), math.max(prev.docId, row.docId), j)
              }
            }
            if (bucket.size < maxBucket) bucket = BucketDoc(row.docId, row.shc) :: bucket
          }
          state.update(bucket)
          out.result().iterator
      }

    // a pair colliding in several bands emits once per band — keep one
    pairs.dropDuplicates("a_id", "b_id").as[NearDupPair]
  }
}
