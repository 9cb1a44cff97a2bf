package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Registry-wide determinism under re-partitioning: every query must
  * return BIT-IDENTICAL rows when the shuffle partition count changes
  * (4 → 7). This is the cluster-shape invariance a 1000-executor
  * deployment relies on: partial aggregates combine in a different
  * order, map-side combines see different row subsets, exchanges split
  * differently — and none of it may leak into results. The registry's
  * float discipline (exact decimal sums, scaled-integer rounding,
  * integer-operand quotients, order-free integer term sums) exists
  * precisely to make this hold; this spec enforces it mechanically so
  * a future query can't quietly ship an order-dependent double SUM.
  *
  * Zero exclusions (r16 — closing r15 VERDICT #5): q37b/q102 train
  * float k-means indexes and were excluded as "accumulation-order-
  * dependent", but that conflated CROSS-ENGINE reproducibility (float
  * Lloyd genuinely can't be replayed bit-identically in DuckDB, which
  * is why their ORACLE is the rank-1 witness) with cross-PARTITIONING
  * reproducibility, which holds structurally: the training sample is a
  * TakeOrderedAndProject collect (ordered identically at any partition
  * count) and Lloyd accumulates over it SEQUENTIALLY on the driver, so
  * the centroids — and every per-row score and totally-ordered
  * tie-broken rank downstream — are pure functions of the data.
  */
class DeterminismSpec extends SparkSpecBase {

  test("every registry query is bit-identical under 4 vs 7 shuffle partitions") {
    val names = SparkEntry.queries.keys.toSeq.sorted

    def pass(partitions: Int): Map[String, Seq[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      names.map { n =>
        // multiset compare: rendered rows, sorted — ORDER BY ties may
        // legitimately permute, values may not change
        n -> SparkEntry.queries(n)(spark, sfDir).collect()
          .map(_.toString).sorted.toSeq
      }.toMap
    }

    val (a, b) =
      try (pass(4), pass(7))
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")

    val diffs = names.filter(n => a(n) != b(n)).map { n =>
      val onlyA = a(n).diff(b(n)).take(2)
      val onlyB = b(n).diff(a(n)).take(2)
      s"$n: ${a(n).size} vs ${b(n).size} rows; 4-part-only=$onlyA 7-part-only=$onlyB"
    }
    assert(diffs.isEmpty,
      s"${diffs.size} queries change results with the partition count:\n${diffs.mkString("\n")}")
  }
}
