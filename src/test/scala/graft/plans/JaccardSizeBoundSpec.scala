package graft.plans

import graft.SparkSpecBase
import graft.functions.expr.SimilarityExpressions
import org.apache.spark.sql.functions._

class JaccardSizeBoundSpec extends SparkSpecBase {

  // pairs with wildly different set sizes: the bound prunes them before
  // the kernel; near-equal sizes survive to exact comparison. Written
  // through parquet so the Filter isn't constant-folded into the
  // LocalRelation at plan time.
  private lazy val pairsPath = {
    import spark.implicits._
    val p = s"/tmp/graft_jsb_${System.nanoTime()}"
    Seq(
      (1L, Seq(1L, 2L, 3L, 4L), 2L, Seq(1L, 2L, 3L, 5L)),   // j = 3/5 = 0.6
      (3L, Seq(1L, 2L), 4L, (1L to 40L)),                    // size skew, j small
      (5L, Seq(7L, 8L, 9L), 6L, Seq(7L, 8L, 9L))             // j = 1.0
    ).toDF("a_id", "a_sh", "b_id", "b_sh")
      .write.mode("overwrite").parquet(p)
    p
  }
  private def pairsDf = spark.read.parquet(pairsPath)

  private def query = pairsDf.where(
    SimilarityExpressions.jaccardSortedLong(col("a_sh"), col("b_sh")) >= 0.5)

  test("rule injects the size bound and preserves results") {
    val before = query.queryExecution.optimizedPlan.toString
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ JaccardSizeBound
    try {
      val after = query.queryExecution.optimizedPlan.toString
      assert(!before.contains("greatest"))
      assert(after.contains("greatest") && after.contains("least"),
        s"expected injected size bound in:\n$after")
      val ids = query.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(ids == Set((1L, 2L), (5L, 6L))) // skewed pair pruned by BOTH forms
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq JaccardSizeBound)
    }
  }

  test("rule is idempotent under the optimizer's fixpoint batch") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ JaccardSizeBound
    try {
      val optimized = query.queryExecution.optimizedPlan
      val greatestCount = "greatest".r.findAllIn(optimized.toString).length
      assert(greatestCount == 1, s"bound injected $greatestCount times:\n$optimized")
      // a second full optimize pass over the already-bounded plan adds nothing
      val again = JaccardSizeBound(optimized)
      assert(again.toString == optimized.toString)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq JaccardSizeBound)
    }
  }
}
