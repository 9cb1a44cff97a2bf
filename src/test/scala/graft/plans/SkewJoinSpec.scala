package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** AQE skew-join evidence: a planted hot key makes one shuffle
  * partition dwarf the rest; with skew thresholds scaled to test-sized
  * data, AQE's OptimizeSkewedJoin splits the oversized partition into
  * multiple tasks (`skew=true` in the final plan) — the runtime guard
  * SCALE.md leans on for naturally skewed join keys at 100 TB. */
class SkewJoinSpec extends SparkSpecBase {

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // derived session: same cluster, test-scaled AQE skew thresholds
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    import s.implicits._

    // 50k rows on ONE key vs 100 spread keys; fact ⋈ dim on the hot key
    val fact = (1 to 50000).map(i => (7L, s"payload_$i")) ++
      (1 to 100).map(i => (i.toLong + 100L, s"p$i"))
    val dim = (1 to 300).map(i => (if (i <= 200) 7L else i.toLong, s"dim_$i"))
    val f = fact.toDF("k", "payload").repartition(8)
    val d = dim.toDF("k", "name").repartition(8)

    val joined = f.join(d, "k")
    assert(joined.count() == 50000L * 200) // hot key × its 200 dim rows
    // drive THIS query execution (count() plans separately), then read
    // the finalized adaptive plan
    joined.queryExecution.toRdd.foreach(_ => ())
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"expected skew split in:\n${plan.take(3000)}")
  }
}
