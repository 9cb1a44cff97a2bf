package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {

  test("stratified sample respects per-stratum fractions") {
    val totals = Tables(spark, sfDir).events
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Relational.q44.run(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(!sampled.contains("error"))                     // fraction 0
    assert(sampled("signup") == totals("signup"))          // fraction 1
    val clickRatio = sampled("click").toDouble / totals("click")
    assert(clickRatio > 0.3 && clickRatio < 0.7, s"click ratio $clickRatio")
    // deterministic under the fixed seed
    val again = Relational.q44.run(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == sampled)
  }

  test("shard packing (q104) is hash-balanced and lossless") {
    // sf0.01: 500 docs over 16 shards, expected ~31/shard. Hash
    // uniformity bound: no shard empty, none more than 3x the mean —
    // the property that keeps training-shard sizes even regardless of
    // doc_id clustering or source skew.
    val rows = Curation.q104.run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 16, s"expected 16 shards, got ${rows.length}")
    val counts = rows.map(_.getAs[Long]("n_docs"))
    val total = counts.sum
    assert(total == Tables(spark, "/root/testdata/sf0.01").documents.count())
    val mean = total.toDouble / 16
    assert(counts.min > 0, "empty shard")
    assert(counts.max < 3 * mean, s"skewed shard: max ${counts.max} vs mean $mean")
  }
}
