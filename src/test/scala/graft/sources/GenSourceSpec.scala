package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class GenSourceSpec extends SparkSpecBase {

  private def gen(rows: Long, partitions: Int) =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows.toString).option("partitions", partitions.toString)
      .load()

  test("generates deterministic rows independent of partitioning") {
    val a = gen(1000, 4).orderBy("id").collect()
    val b = gen(1000, 7).orderBy("id").collect()
    assert(a.length == 1000)
    assert(a.toSeq == b.toSeq) // same rows regardless of partition layout
    assert(a.map(_.getLong(0)).toSeq == (0L until 1000L))
  }

  test("range filters on id prune whole input partitions") {
    // 8 partitions of 125 ids; id >= 900 touches only the last one
    val n = gen(1000, 8).where(col("id") >= 900L).count()
    assert(n == 100)
    assert(GenSource.plannedPartitions == 1,
      s"expected 1 planned partition, got ${GenSource.plannedPartitions}")
    assert(GenSource.prunedPartitions == 7)
  }

  test("pushed filters are exact (bounds honored, residual semantics)") {
    val rows = gen(1000, 8)
      .where(col("id") > 100L && col("id") <= 110L && col("event_type") =!= "zzz")
      .orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == (101L to 110L))
  }

  test("column pruning reaches the reader (narrow projection still correct)") {
    val agg = gen(5000, 4).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg.values.sum == 5000L)
    assert(agg.keySet.subsetOf(GenSource.EventTypes.toSet))
    // pushdown is visible in the scan description
    val desc = gen(5000, 4).where(col("id") < 10L).select("id")
      .queryExecution.executedPlan.toString
    assert(desc.contains("graftgen") || desc.contains("BatchScan"))
  }

  test("equality pushdown plans a single-id partition") {
    val r = gen(1000, 8).where(col("id") === 512L).collect()
    assert(r.length == 1 && r.head.getLong(0) == 512L)
    assert(GenSource.plannedPartitions == 1)
  }
}
