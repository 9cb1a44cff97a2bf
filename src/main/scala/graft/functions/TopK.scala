package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder

/** Bounded-heap partial top-k: the scale-shaped head for the brute-force
  * ANN baselines (q31/q121/q123).
  *
  * The naive head — `row_number() OVER (PARTITION BY qid ORDER BY score
  * DESC)` — shuffles EVERY scored row into ≤|queries| partitions and
  * sorts the full per-query candidate set on one task; at 100 TB that is
  * a |corpus|-row shuffle into 10–20 reducers. This aggregator instead
  * rides `groupBy(qid)` as a `TypedImperativeAggregate` (via `udaf`),
  * so each task keeps at most a 4k-element buffer per (partition, qid),
  * compacts it to the best k whenever it fills, and ships only k-row
  * partials to the final merge — a TakeOrdered-per-key: the corpus is
  * scanned and DISCARDED, never shuffled.
  *
  * Ordering is (score DESC, id ASC) with Spark SQL double semantics
  * (`java.lang.Double.compare`: NaN greatest, ties to the smaller id),
  * identical to the `row_number` window it replaces, so oracle hashes
  * are unchanged. The result array is emitted in rank order; callers
  * `posexplode` it and use `pos + 1` as the rank.
  */
object TopK {

  /** (score DESC, id ASC) — or (score ASC, id ASC) when `asc` — true
    * iff (s1, i1) ranks strictly before. */
  private def before(s1: Double, i1: Long, s2: Double, i2: Long,
      asc: Boolean): Boolean = {
    val c0 = java.lang.Double.compare(s1, s2)
    val c = if (asc) -c0 else c0
    c > 0 || (c == 0 && i1 < i2)
  }

  /** Mutable bounded buffer: parallel arrays + fill count. Encoded only
    * at shuffle boundaries (TypedImperativeAggregate keeps it as a live
    * JVM object between per-row updates). */
  final case class Buf(var ids: Array[Long], var scores: Array[Double], var n: Int)

  /** Keep the best k of b's n entries (rank order), reusing capacity. */
  private def compact(b: Buf, k: Int, asc: Boolean): Buf = {
    if (b.n <= k) return b
    val idx = Array.range(0, b.n)
      .sortWith((a, c) => before(b.scores(a), b.ids(a), b.scores(c), b.ids(c), asc))
    val ids = new Array[Long](b.ids.length)
    val sc = new Array[Double](b.ids.length)
    var i = 0
    while (i < k) { ids(i) = b.ids(idx(i)); sc(i) = b.scores(idx(i)); i += 1 }
    Buf(ids, sc, k)
  }

  /** A buffer with at least one free slot: allocate 4k on first touch,
    * compact to k (freeing 3k slots) when full. */
  private def room(b: Buf, k: Int, asc: Boolean): Buf =
    if (b.n < b.ids.length) b
    else if (b.ids.length == 0)
      Buf(new Array[Long](4 * k), new Array[Double](4 * k), 0)
    else compact(b, k, asc)

  private def add(b: Buf, k: Int, id: Long, score: Double, asc: Boolean): Buf = {
    val c = room(b, k, asc)
    c.ids(c.n) = id; c.scores(c.n) = score; c.n += 1
    c
  }

  private def mergeBufs(k: Int, b1: Buf, b2: Buf, asc: Boolean): Buf = {
    var acc = b1
    var i = 0
    while (i < b2.n) { acc = add(acc, k, b2.ids(i), b2.scores(i), asc); i += 1 }
    acc
  }

  private def finishPairs(b: Buf, k: Int, asc: Boolean): Seq[(Long, Double)] = {
    val c = compact(b, k, asc)
    val idx = Array.range(0, c.n)
      .sortWith((a, d) => before(c.scores(a), c.ids(a), c.scores(d), c.ids(d), asc))
    idx.toSeq.map(i => (c.ids(i), c.scores(i)))
  }

  private implicit val bufEnc: Encoder[Buf] = ExpressionEncoder[Buf]()

  private class DoubleAgg(k: Int, asc: Boolean = false)
      extends Aggregator[(Long, Double), Buf, Seq[(Long, Double)]] {
    def zero: Buf = Buf(Array.emptyLongArray, Array.emptyDoubleArray, 0)
    def reduce(b: Buf, in: (Long, Double)): Buf = add(b, k, in._1, in._2, asc)
    def merge(b1: Buf, b2: Buf): Buf = mergeBufs(k, b1, b2, asc)
    def finish(b: Buf): Seq[(Long, Double)] = finishPairs(b, k, asc)
    def bufferEncoder: Encoder[Buf] = bufEnc
    def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** Integer-score variant (SQ8 dots, vote counts). Scores carry through
    * the shared double buffer — exact for |score| < 2^53, far above the
    * 8-bit-code dot range (≤ 64·127² ≈ 2^20) — and emerge as BIGINTs. */
  private class LongAgg(k: Int)
      extends Aggregator[(Long, Long), Buf, Seq[(Long, Long)]] {
    def zero: Buf = Buf(Array.emptyLongArray, Array.emptyDoubleArray, 0)
    def reduce(b: Buf, in: (Long, Long)): Buf = add(b, k, in._1, in._2.toDouble, asc = false)
    def merge(b1: Buf, b2: Buf): Buf = mergeBufs(k, b1, b2, asc = false)
    def finish(b: Buf): Seq[(Long, Long)] =
      finishPairs(b, k, asc = false).map { case (id, s) => (id, s.toLong) }
    def bufferEncoder: Encoder[Buf] = bufEnc
    def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** `topKDouble(k)(idCol, scoreCol)` → array<struct<_1: id, _2: score>>
    * in (score DESC, id ASC) order, length ≤ k. */
  def topKDouble(k: Int): UserDefinedFunction = udaf(new DoubleAgg(k))

  /** Long-score twin — see [[LongAgg]] for the exactness argument. */
  def topKLong(k: Int): UserDefinedFunction = udaf(new LongAgg(k))

  /** Bounded-heap BOTTOM-k: (score ASC, id ASC) — the distance-ordered
    * head (q102's ADC shortlist), where the naive formulation is the
    * same corpus-wide `row_number` shuffle into ≤|queries| reducers.
    * A separate variant rather than a caller-side `-score` negation:
    * negating doubles flips ±0.0 and NaN placement, and the heap must
    * rank EXACTLY like the `ORDER BY score ASC, id` window it replaces. */
  def bottomKDouble(k: Int): UserDefinedFunction = udaf(new DoubleAgg(k, asc = true))
}
