package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query on SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. A small untimed warmup first so JVM/codegen
  * startup isn't attributed to whichever query happens to run first. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table scan + exercise codegen/shuffle machinery.
    val t = Tables(spark, sfDir)
    Seq(t.lineitem, t.orders, t.customer, t.events, t.documents, t.embeddings)
      .foreach(df => df.limit(1).count())
    SparkEntry.queries.get("q01_pricing_summary").foreach(f => f(spark, sfDir).count())

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // keep the line compact (3-decimal seconds) and the headline fields
    // in front of the per-query map, so a capture that truncates the
    // tail still retains a parsable prefix with the total
    def f3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"queries":$qs}""")
    System.out.flush()
    Thread.sleep(200) // let stdout drain before shutdown log noise
    spark.stop()
  }
}
