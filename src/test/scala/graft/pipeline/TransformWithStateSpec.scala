package graft.pipeline

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming._
import org.apache.spark.sql.{Encoder, Encoders}

/** Word count on the modern StatefulProcessor API (`transformWithState`)
  * — typed ValueState instead of the fold-style GroupState. */
class CountProcessor extends StatefulProcessor[String, Message[String], Message[(String, Long)]] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String, rows: Iterator[Message[String]],
      timerValues: TimerValues): Iterator[Message[(String, Long)]] = {
    val n = (if (count.exists()) count.get() else 0L) + rows.size
    count.update(n)
    Iterator.single(Message(key, (key, n), Some(key)))
  }
}

class TransformWithStateSpec extends SparkSpecBase {
  import spark.implicits._

  test("transformWithState word count matches the classic stateful path") {
    // transformWithState needs multi-column-family state → RocksDB
    // provider (the scale-grade store; also what a cluster should run)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Message[String]](spark, 2)
    val split = Intersection[String, String]("Split") { m =>
      m.content.split(" ").iterator.map(w => m.spinOff(w, Some(w)))
    }
    val run = Pipeline(spark)
      .addRamp("in", input.toDS())
      .addIntersection("in", "words", split, Grouping.HashRing)
      .addProcessorIntersection("words", "counts",
        (m: Message[String]) => m.groupingValue.getOrElse(m.content),
        new CountProcessor)
      .addSink("counts", StreamSink.Memory(OutputMode.Update), "tws_out")
      .run()

    input.addData(Seq(Message("1", "to be or not to be")))
    run.processAllAvailable()
    input.addData(Seq(Message("2", "be here now")))
    run.processAllAvailable()

    val got = spark.table("tws_out")
      .selectExpr("content._1 AS w", "content._2 AS n")
      .groupBy("w").agg(org.apache.spark.sql.functions.max("n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("to" -> 2L, "be" -> 3L, "or" -> 1L, "not" -> 1L, "here" -> 1L, "now" -> 1L))
    run.stop()
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
