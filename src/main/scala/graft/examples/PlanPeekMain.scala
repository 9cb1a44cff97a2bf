package graft.examples

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the executed physical plan of one or more registry
  * queries — the `.explain`-and-iterate loop the plan gates
  * ([[graft.plans.PlanShapeSpec]], plan_census.tsv) then pin.
  *
  * Usage: sbt "runMain graft.examples.PlanPeekMain q187_line_dedup [more...]"
  * Optional env: SPARK_GRAFT_SF_DIR (default sf0.001).
  */
object PlanPeekMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
