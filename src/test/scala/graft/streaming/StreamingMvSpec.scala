package graft.streaming

import graft.{SparkSpecBase, Tables}
import graft.QueryDsl.dec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The incremental-MV story (q143) run as a LIVE stream: Structured
  * Streaming's stateful aggregation IS the partial-aggregate state
  * table — each micro-batch's rows merge into the per-key (count, exact
  * decimal sums) state, which is precisely the state ⊎ delta re-reduce
  * the batch query models. After streaming the whole table in three
  * deltas, the maintained MV must equal q143's (and therefore a full
  * recompute's) rows bit-for-bit — decimal merge is order-insensitive,
  * so batch boundaries cannot show through. */
object StreamingMvSpec {
  final case class Li(l_returnflag: String, l_linestatus: String,
      l_quantity: Double, l_extendedprice: Double)
}

class StreamingMvSpec extends SparkSpecBase {
  import spark.implicits._
  import StreamingMvSpec.Li

  test("streamed MV state equals the q143 batch merge after three deltas") {
    val rows = Tables(spark, sfDir).lineitem
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .as[Li].collect().toSeq
    val input = MemoryStream[Li](spark)
    val mv = input.toDS()
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_price"))
    val q = mv.writeStream.format("memory").queryName("mv_out")
      .outputMode("complete").start()
    try {
      rows.grouped(math.max(rows.size / 3, 1)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val got = spark.table("mv_out")
        .as[(String, String, Long, Double, Double)]
        .collect().toSeq.sortBy(t => (t._1, t._2))
      val want = graft.queries.Relational4.q143.run(spark, sfDir)
        .as[(String, String, Long, Double, Double)]
        .collect().toSeq.sortBy(t => (t._1, t._2))
      assert(got == want)
    } finally q.stop()
  }
}
