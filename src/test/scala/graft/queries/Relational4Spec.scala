package graft.queries

import graft.SparkSpecBase
import graft.QueryDsl.dec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Twins for the maintenance batch: q143's merge proven equal to a full
  * recompute inside Spark (the oracle proves it cross-engine), its delta
  * predicate proven pushed to the scan, and q144's SCD2 output checked
  * against the interval invariants that define an effective-dated
  * history. */
class Relational4Spec extends SparkSpecBase {

  test("q143 incremental merge equals a from-scratch recompute") {
    val full = graft.Tables(spark, sfDir).lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().toSeq
    val merged = Relational4.q143.run(spark, sfDir).collect().toSeq
    assert(merged == full)
  }

  test("q143's delta side reads only the slice past the high-water mark (pushed filter)") {
    val plan = Relational4.q143.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    // both slices must push their shipdate bound into the parquet scan —
    // at 100 TB the >= side is the only data the refresh job touches
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"shipdate slice predicates not pushed to the scan:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("IsNotNull(l_shipdate"),
      s"delta-side pushdown missing:\n$plan")
  }

  test("q144 SCD2 history satisfies the effective-dating invariants") {
    val rows = Relational4.q144.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5), r.getBoolean(6)))
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (uid, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions number 1..k with no gaps
      assert(sorted.map(_._2).toSeq == (1L to sorted.length.toLong).toSeq,
        s"user $uid has version gaps")
      // exactly one open (current) version, and it is the last
      assert(sorted.count(_._5.isEmpty) == 1 && sorted.last._5.isEmpty,
        s"user $uid current-version flag broken")
      assert(sorted.count(_._7) == 1 && sorted.last._7)
      // intervals chain: valid_to == next version's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $uid intervals do not chain")
          // adjacent versions must differ in tier, else they'd be one run
          assert(a._3 != b._3, s"user $uid has a non-change version boundary")
        case _ => ()
      }
    }
    // every event is owned by exactly one version
    val nEvents = graft.Tables(spark, sfDir).events.count()
    assert(rows.map(_._6).sum == nEvents)
  }
}
