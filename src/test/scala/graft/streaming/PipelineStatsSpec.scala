package graft.streaming

import graft.SparkSpecBase
import graft.pipeline.{Message, Pipeline, StreamSink}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class PipelineStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("percentile oracle from the reference test suite") {
    // `motorway/tests/test_utils.py:7-9`
    val counts = Map(0.0 -> 2L, 1.0 -> 1L, 2.0 -> 1L, 3.0 -> 3L, 4.0 -> 1L)
    assert(PipelineStats.percentileFromCounts(counts, 0.95) == 4.0)
    assert(PipelineStats.percentileFromCounts(counts, 0.5) == 2.0)
    assert(PipelineStats.percentileFromCounts(Map(7.0 -> 1L), 0.95) == 7.0)
  }

  test("listener accumulates processed counts and batch durations") {
    val listener = new PipelineStatsListener(() => 30)
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[Message[String]](spark, 2)
      val run = Pipeline(spark)
        .addRamp("s", input.toDS())
        .addSink("s", StreamSink.Memory(), "stats_probe")
        .run()
      input.addData(Seq(Message("1", "a"), Message("2", "b"), Message("3", "c")))
      run.processAllAvailable()
      run.stop()
      // listener events are async; wait briefly for delivery
      val deadline = System.currentTimeMillis() + 10000
      def processed = listener.snapshot.get("stats_probe").map(_.processed).getOrElse(0L)
      while (processed < 3 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(processed == 3)
      val s = listener.snapshot("stats_probe")
      assert(s.histogram(30).processedCount == 3)
      assert(s.avgTimeTakenMs >= 0.0 && s.p95TimeTakenMs >= 0.0)
      val json = listener.snapshotJson
      assert(json.contains("\"name\":\"stats_probe\""))
      assert(json.contains("\"processed\":3"))
      assert(json.contains("\"status\":\"available\""))
    } finally spark.streams.removeListener(listener)
  }
}
