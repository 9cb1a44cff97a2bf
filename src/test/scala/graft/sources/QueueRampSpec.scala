package graft.sources

import graft.SparkSpecBase
import graft.pipeline.{Grouping, Intersection, Message, Pipeline, StreamSink}
import org.apache.spark.sql.functions._

class QueueRampSpec extends SparkSpecBase {
  import spark.implicits._

  private def entry(i: Int, content: String, g: String = null) =
    QueueRamp.Entry(i.toString, content, g, i.toLong * 1000000L)

  /** Memory-sink reads race with the continuously-cycling
    * ProcessingTime(0) trigger; poll until the condition stabilizes
    * (same pattern as PipelineStatsSpec for async listener events). */
  private def eventually(timeoutMs: Long = 20000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var ok = cond
    while (!ok && System.currentTimeMillis() < deadline) { Thread.sleep(200); ok = cond }
    ok
  }

  test("DSv2 ramp: micro-batch read, partition split, commit-on-success") {
    val qn = "ramp-basic"
    QueueRamp.drop(qn)
    QueueRamp.enqueue(qn, (1 to 10).map(i => entry(i, s"payload-$i")))

    val df = spark.readStream
      .format(classOf[QueueRampProvider].getName)
      .option("queue", qn).option("partitions", "4")
      .load()
    val q = df.writeStream.format("memory").queryName("ramp_out").start()
    q.processAllAvailable()
    assert(eventually()(spark.table("ramp_out").count() == 10),
      s"rows=${spark.table("ramp_out").count()}")

    // commit(N) is delivered when batch N+1 is constructed (acks lag one
    // batch — the Kafka-ramp oldest-uncompleted contract). Trigger the
    // next batch, then batch 0's 10 messages must be acked.
    QueueRamp.enqueue(qn, Seq(entry(11, "late")))
    q.processAllAvailable()
    assert(eventually()(spark.table("ramp_out").count() == 11))
    assert(eventually()(QueueRamp.committed(qn) == 10),
      s"committed=${QueueRamp.committed(qn)}")
    assert(QueueRamp.ackedIds(qn).toSet == (1 to 10).map(_.toString).toSet)

    QueueRamp.enqueue(qn, Seq(entry(12, "later")))
    q.processAllAvailable()
    assert(eventually()(QueueRamp.committed(qn) == 11))
    q.stop()
    QueueRamp.drop(qn)
  }

  test("ramp feeds the Pipeline DSL as a typed message stream") {
    val qn = "ramp-topo"
    QueueRamp.drop(qn)
    QueueRamp.enqueue(qn, Seq(entry(1, "a b", "g1"), entry(2, "c", "g2")))

    val raw = spark.readStream
      .format(classOf[QueueRampProvider].getName)
      .option("queue", qn).load()
    val msgs = raw.select(col("id"), col("content"), col("groupingValue"))
      .as[(String, String, Option[String])]
      .map { case (id, c, g) => Message(id, c, g) }

    val split = Intersection[String, String]("Split") { m =>
      m.content.split(" ").iterator.map(w => m.spinOff(w, Some(w)))
    }
    val run = Pipeline(spark)
      .addRamp("in", msgs)
      .addIntersection("in", "words", split, Grouping.HashRing)
      .addSink("words", StreamSink.Memory(), "ramp_topo_out")
      .run()
    run.processAllAvailable()
    assert(eventually()(
      spark.table("ramp_topo_out").select("content").as[String].collect().sorted.toSeq
        == Seq("a", "b", "c")))
    // next batch delivers the ack for batch 0's two messages
    QueueRamp.enqueue(qn, Seq(entry(3, "d", "g3")))
    run.processAllAvailable()
    assert(eventually()(QueueRamp.committed(qn) == 2))
    run.stop()
    QueueRamp.drop(qn)
  }

  test("admission control caps rows per micro-batch (backpressure parity)") {
    val qn = "ramp-throttle"
    QueueRamp.drop(qn)
    QueueRamp.enqueue(qn, (1 to 10).map(i => entry(i, s"m$i")))
    val df = spark.readStream
      .format(classOf[QueueRampProvider].getName)
      .option("queue", qn).option("maxPerTrigger", "4")
      .load()
    val q = df.writeStream.format("memory").queryName("throttle_out").start()
    q.processAllAvailable()
    assert(eventually()(spark.table("throttle_out").count() == 10))
    // 10 rows admitted in ceil(10/4) = 3 batches, none larger than 4
    val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    assert(batchSizes.forall(_ <= 4), s"batches=$batchSizes")
    assert(batchSizes.length >= 3)
    q.stop()
    QueueRamp.drop(qn)
  }

  test("canonical word-count topology: every ramp id succeeds, none fail") {
    // the reference's end-to-end fixture assertions
    // (`tests/sample_pipeline.py:34-38`): all 10 sentence ids reach
    // success(), zero failures — here: all acked via commit, zero dead
    // letters.
    val qn = "ramp-wordcount"
    QueueRamp.drop(qn)
    val sentences = Seq(
      "Oak is strong and also gives shade", "Cats and dogs each hate the other",
      "The pipe began to rust while new", "Open the crate but dont break the glass",
      "Add the sum to the product of these three", "Thieves who rob friends deserve jail",
      "The ripe taste of cheese improves with age", "Act on these orders with great speed",
      "The hog crawled under the high fence", "Move the vat over the hot fire")
    QueueRamp.enqueue(qn, sentences.zipWithIndex.map { case (s, i) => entry(i, s) })

    val msgs = spark.readStream
      .format(classOf[QueueRampProvider].getName).option("queue", qn).load()
      .select(col("id"), col("content"), col("groupingValue"))
      .as[(String, String, Option[String])]
      .map { case (id, c, g) => Message(id, c, g) }
    val split = Intersection[String, String]("Split") { m =>
      m.content.split(" ").iterator.map(w => m.spinOff(w, Some(w)))
    }
    val run = Pipeline(spark)
      .addRamp("sentence", msgs)
      .addIntersection("sentence", "word", split, Grouping.HashRing)
      .withDeadLetterStream()
      .addSink("word", StreamSink.Memory(), "wc_ramp_out")
      .addSink(Pipeline.DeadLetterStream, StreamSink.Memory(), "wc_ramp_dead")
      .run()
    run.processAllAvailable()
    // trigger the next batch so batch 0's acks are delivered
    QueueRamp.enqueue(qn, Seq(entry(10, "flush")))
    run.processAllAvailable()

    assert(eventually()(QueueRamp.ackedIds(qn).toSet == (0 to 9).map(_.toString).toSet),
      s"acked=${QueueRamp.ackedIds(qn)}")
    assert(spark.table("wc_ramp_dead").isEmpty) // ≙ zero failed()
    val words = spark.table("wc_ramp_out").count()
    assert(words >= sentences.map(_.split(" ").length).sum)
    run.stop()
    QueueRamp.drop(qn)
  }

  test("queue bootstrap: ramp starts against a queue nobody created (SQS get-or-create parity)") {
    val qn = "ramp-bootstrap-fresh"
    QueueRamp.drop(qn)
    assert(!QueueRamp.exists(qn))
    // the stream itself must bootstrap the queue before its first read
    val df = spark.readStream
      .format(classOf[QueueRampProvider].getName)
      .option("queue", qn)
      .load()
    val q = df.writeStream.format("memory").queryName("bootstrap_out").start()
    q.processAllAvailable()
    assert(QueueRamp.exists(qn), "stream did not create the missing queue")
    assert(spark.table("bootstrap_out").count() == 0)
    // producers arriving after the consumer see the same queue
    QueueRamp.enqueue(qn, Seq(entry(1, "late-producer")))
    q.processAllAvailable()
    assert(eventually()(spark.table("bootstrap_out").count() == 1))
    q.stop()
    // explicit API: created-on-first, found-on-second (mixin's two branches)
    QueueRamp.drop(qn)
    assert(QueueRamp.ensureQueue(qn), "first ensureQueue should create")
    assert(!QueueRamp.ensureQueue(qn), "second ensureQueue should find")
    QueueRamp.drop(qn)
  }

  // The failure posture the reference guarantees (pipeline.py:127-135:
  // operator failures are never silent): a throwing poll must keep the
  // schedule alive AND surface as a counted dead letter with traceback
  // at /detail/<queue>/ — not vanish.
  test("polling ramp reports poll failures: counted, traceback at /detail/") {
    import graft.streaming.{PipelineStatsListener, StatsServer}
    val qn = "ramp-poll-fail"
    QueueRamp.drop(qn)
    val listener = new PipelineStatsListener(() => 0)
    val ramp = new PollingRamp(qn, periodMillis = 100000L,
        onFailure = PollingRamp.reportTo(listener, qn))(tick =>
      if (tick % 2 == 0) throw new RuntimeException(s"salesforce outage at tick $tick")
      else Seq(QueueRamp.Entry(s"t$tick", s"scan-$tick", null, 0L)))
    ramp.pollNow(4) // ticks 0,2 fail; 1,3 enqueue — outage does not stop polling
    assert(QueueRamp.size(qn) == 2, "successful polls must still enqueue")
    val s = listener.snapshot(qn)
    assert(s.failed == 2)
    assert(s.failures.map(_.messageId) == Vector("poll-0", "poll-2"))
    assert(s.failures.head.error.contains("salesforce outage at tick 0"))
    assert(s.failures.head.traceback.contains("RuntimeException"))
    assert(s.state(0) == "failing", "status heuristic must flip to failing")
    // end-to-end: the drill-down page renders the outage
    val srv = new StatsServer(listener)
    try {
      val html = scala.io.Source.fromURL(
        s"http://127.0.0.1:${srv.boundPort}/detail/$qn/")("UTF-8").mkString
      assert(html.contains("salesforce outage at tick 0"), "outage not on /detail/")
    } finally srv.stop()
    ramp.close()
    QueueRamp.drop(qn)
  }

  test("enqueue returns the start offset atomically under producer races") {
    // the takeover window: the old lease owner and the new one both
    // pass their `owned` check and enqueue into the same shard queue —
    // offsets derived from a separate size() read would interleave and
    // skew the offset→sequence mapping; the atomic return cannot
    val qn = "ramp-atomic-offset"
    QueueRamp.drop(qn)
    QueueRamp.ensureQueue(qn)
    val nThreads = 8; val nBatches = 50
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Seq[String])]())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val start = new java.util.concurrent.CountDownLatch(1)
    (0 until nThreads).foreach { t =>
      pool.submit(new Runnable { def run(): Unit = {
        start.await()
        (0 until nBatches).foreach { b =>
          val ids = (0 until 3).map(i => s"t$t-b$b-$i")
          val off = QueueRamp.enqueue(qn, ids.map(id =>
            QueueRamp.Entry(id, id, null, 0L)))
          got.add((off, ids))
        }
      }})
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS))
    assert(QueueRamp.size(qn) == nThreads.toLong * nBatches * 3)
    got.forEach { t =>
      val (off, ids) = t
      assert(QueueRamp.slice(qn, off, off + ids.size).map(_.id) == ids,
        s"offset $off does not hold the batch that claimed it")
    }
    QueueRamp.drop(qn)
  }

  test("polling ramp enqueues per tick with stable ids") {
    val qn = "ramp-poll"
    QueueRamp.drop(qn)
    val ramp = new PollingRamp(qn, periodMillis = 100000L)(tick =>
      Seq(QueueRamp.Entry(s"t$tick", s"scan-result-$tick", null, 0L)))
    ramp.pollNow(3)
    assert(QueueRamp.size(qn) == 3)
    assert(QueueRamp.slice(qn, 0, 3).map(_.id) == Seq("t0", "t1", "t2"))
    ramp.close()
    QueueRamp.drop(qn)
  }
}
