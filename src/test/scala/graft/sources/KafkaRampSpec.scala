package graft.sources

import graft.SparkSpecBase
import java.sql.Timestamp

class KafkaRampSpec extends SparkSpecBase {
  import spark.implicits._

  test("read options pin the reference's operational constants") {
    val o = KafkaRamp.readOptions("b1:9092,b2:9092", Seq("t1", "t2"))
    assert(o("subscribe") == "t1,t2")
    assert(o("maxOffsetsPerTrigger") == "10000") // global uncompleted bound
    assert(o("kafka.bootstrap.servers") == "b1:9092,b2:9092")
  }

  test("kafka rows project to the message envelope with partition-offset ids") {
    val kafkaShaped = Seq(
      (Array[Byte](107), "payload-a".getBytes, 0, 42L, new Timestamp(1000L)),
      (null.asInstanceOf[Array[Byte]], "payload-b".getBytes, 3, 7L, new Timestamp(2000L)))
      .toDF("key", "value", "partition", "offset", "timestamp")
    val env = KafkaRamp.toMessageEnvelope(kafkaShaped).collect()
    assert(env.map(_.getString(0)).toSeq == Seq("0-42", "3-7")) // {partition}-{offset}
    assert(env.map(_.getString(1)).toSeq == Seq("payload-a", "payload-b"))
    assert(env(0).getString(2) == "k" && env(1).getString(2) == null)
  }

  test("sink size guard splits oversized payloads") {
    val env = Seq(("g", "small"), ("g", "x" * (KafkaSink.MaxMessageBytes + 1)))
      .toDF("groupingValue", "content")
    val (ok, oversize) = KafkaSink.partitionBySize(env)
    assert(ok.count() == 1 && oversize.count() == 1)
    assert(ok.head.getString(1) == "small")
  }
}
