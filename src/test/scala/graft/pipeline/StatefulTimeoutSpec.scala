package graft.pipeline

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** State timeout parity with the controller's 30-minute in-flight
  * MESSAGE_TIMEOUT (`motorway/controller.py:31,176-180`): keys silent
  * past the timeout surface through `onTimeout` and drop their state.
  *
  * With ProcessingTimeTimeout the engine runs a batch every trigger to
  * evaluate timeouts, so this pipeline uses a real trigger interval and
  * the assertions poll with a deadline instead of processAllAvailable.
  */
class StatefulTimeoutSpec extends SparkSpecBase {
  import spark.implicits._

  object TimeoutCounter extends StatefulIntersection[String, String, Long, (String, String)] {
    override def name = "TimeoutCounter"
    def key(m: Message[String]): String = m.groupingValue.getOrElse(m.content)
    def initialState: Long = 0L
    override def timeoutMillis: Option[Long] = Some(500L)
    def update(k: String, in: Seq[Message[String]], st: Long): (Long, Seq[Message[(String, String)]]) =
      (st + in.size, Seq(Message(k, (k, s"count=${st + in.size}"))))
    override def onTimeout(k: String, st: Long): Seq[Message[(String, String)]] =
      Seq(Message(k, (k, s"TIMEOUT after $st")))
  }

  test("silent keys emit timeout messages") {
    val input = MemoryStream[Message[String]](spark, 2)
    val run = Pipeline(spark)
      .addRamp("in", input.toDS())
      .addStatefulIntersection("in", "out", TimeoutCounter)
      .addSink("out", StreamSink.Memory(OutputMode.Update), "timeout_out")
      .run(Trigger.ProcessingTime(250L))

    input.addData(Seq(Message("1", "a", Some("k1")), Message("2", "b", Some("k2"))))

    def rows() = spark.table("timeout_out")
      .selectExpr("content._1 AS k", "content._2 AS v").as[(String, String)].collect()
    val deadline = System.currentTimeMillis() + 60000
    def timedOutKeys() = rows().filter(_._2.startsWith("TIMEOUT")).map(_._1).toSet
    while (!Set("k1", "k2").subsetOf(timedOutKeys()) && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    assert(Set("k1", "k2").subsetOf(timedOutKeys()), s"got ${rows().mkString(",")}")
    // counts were emitted before the timeouts
    assert(rows().count(_._2 == "count=1") >= 2)
    run.stop()
  }
}
