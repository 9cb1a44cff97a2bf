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
}
