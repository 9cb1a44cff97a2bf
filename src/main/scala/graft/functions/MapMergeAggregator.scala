package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregator — the generic form of the reference's
  * dict-union aggregation intersection (`examples/intersections.py:
  * 34-42`: merge partial word-count dicts by summing values per key).
  *
  * As an `Aggregator` it runs as a real two-phase Spark aggregate
  * (partial merge on the map side, final merge after the shuffle) —
  * unlike the reference, where the merge ran in a single process
  * holding every key (the SURVEY §7.4 "unmanaged global state" hazard).
  */
class MapMergeAggregator extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
  def zero: Map[String, Long] = Map.empty

  def reduce(acc: Map[String, Long], m: Map[String, Long]): Map[String, Long] = merge(acc, m)

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    small.foldLeft(large) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
  }

  def finish(acc: Map[String, Long]): Map[String, Long] = acc

  def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
