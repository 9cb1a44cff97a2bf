package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (DataSketches HLL via Spark's
  * hll_sketch_agg / hll_union_agg / hll_sketch_estimate): the sketch is
  * a persistable binary column, so at 100 TB per-partition / per-day
  * sketches are computed once, stored, and UNIONED later — distinct
  * counts over any date range without rescanning events (the pattern a
  * metrics product needs for "uniques this week/month" widgets). */
class SketchSpec extends SparkSpecBase {

  test("per-day sketches union to the global distinct count (within HLL error)") {
    val e = Tables(spark, sfDir).events
    val exact = e.select(countDistinct(col("user_id"))).head().getLong(0)

    // one sketch per day (what would be persisted), then merged
    val perDay = e.groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    assert(perDay.schema("sk").dataType.typeName == "binary") // persistable

    val merged = perDay.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val err = math.abs(merged - exact).toDouble / exact
    assert(err < 0.05, s"merged HLL estimate $merged vs exact $exact (err $err)")
  }

  test("mirrorable HLL (q34) estimates within sketch error bounds") {
    // sf0.01: ~2000 distinct parts per flag >> 2.5m = 640, so the raw
    // estimator (no linear-counting branch) is in its valid zone; the
    // 20% bound is ~3x the m=256 standard error (1.04/sqrt(256) = 6.5%).
    Similarity.q34.run(spark, "/root/testdata/sf0.01").collect().foreach { r =>
      val approx = r.getAs[Double]("approx_parts")
      val exact = r.getAs[Long]("exact_parts")
      assert(exact > 640, s"raw-HLL zone precondition: exact=$exact")
      val err = math.abs(approx - exact) / exact
      assert(err < 0.2, s"${r.getString(0)}: approx $approx vs exact $exact (err $err)")
    }
  }

  test("sketch round-trips through parquet storage") {
    val e = Tables(spark, sfDir).events
    val out = s"/tmp/graft_sketch_${System.nanoTime()}"
    e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .write.mode("overwrite").parquet(out)
    val est = spark.read.parquet(out)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    val exact = e.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05)
  }
}
