package graft.sources

import graft.SparkSpecBase

/** The full ramp loop through the client seams and the REAL engine:
  * external system → protocol consumer → QueueRamp → DSv2 micro-batch
  * stream → sink → engine `commit()` → external ack (SQS delete /
  * Kinesis checkpoint). This is the reference's end-to-end guarantee
  * (`success()` fires only after downstream success) driven through
  * Structured Streaming's own commit placement, not a simulated one.
  * Note the engine delivers `commit(N)` when batch N+1 is constructed
  * (acks lag one batch — same as the reference's Kafka ramp), so each
  * assertion drives one more batch first. */
class CloudEndToEndSpec extends SparkSpecBase {

  private def eventually(timeoutMs: Long = 20000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  private def streamOf(queue: String, name: String) =
    spark.readStream
      .format("graft.sources.QueueRampProvider")
      .option("queue", queue).option("partitions", "2")
      .load()
      .writeStream.format("memory").queryName(name).start()

  test("sqs → stream → sink: the engine's commit deletes the messages in SQS") {
    var now = 0L
    val api = new InMemorySqs(clockMs = () => now)
    (1 to 5).foreach(i => api.send("e2e-jobs", s"payload$i"))
    QueueRamp.drop("sqs-e2e-jobs")
    val poller = new SqsPoller("e2e-jobs", api, visibilityTimeoutMs = 60000L)
    assert(poller.pollOnce(max = 10) == 5)

    val q = streamOf(poller.queue, "sqs_e2e")
    try {
      q.processAllAvailable()
      assert(spark.table("sqs_e2e").count() == 5)
      assert(api.remaining("e2e-jobs") == 5, "nothing deleted before the commit arrives")
      // drive batch 1 so the engine delivers commit(batch 0)
      api.send("e2e-jobs", "payload6")
      assert(poller.pollOnce() == 1)
      q.processAllAvailable()
      assert(eventually()(api.remaining("e2e-jobs") == 1),
        s"first five must be deleted at engine commit; remaining=${api.remaining("e2e-jobs")}")
    } finally q.stop()
    QueueRamp.drop(poller.queue)
  }

  test("kinesis → stream → sink: lease checkpoint follows the engine's commits") {
    val api = new InMemoryKinesis
    val leases = new InMemoryLeaseTable
    (1 to 8).foreach(i => api.append("e2e", "shard-1", s"k$i", s"rec$i"))
    val consumer = new KinesisShardConsumer("e2e", "shard-1", "w1", api, leases)
    QueueRamp.drop(consumer.queue)
    assert(consumer.claim())
    assert(consumer.poll() == 8)

    val q = streamOf(consumer.queue, "kin_e2e")
    try {
      q.processAllAvailable()
      assert(spark.table("kin_e2e").count() == 8)
      // drive batch 1 so the engine delivers commit(batch 0)
      api.append("e2e", "shard-1", "k9", "rec9")
      assert(consumer.poll() == 1)
      q.processAllAvailable()
      assert(eventually()(QueueRamp.committed(consumer.queue) == 8L))
      assert(consumer.checkpoint(), "owner still holds the lease")
      assert(leases.get("shard-1").get.checkpoint == 8L,
        "lease checkpoint must equal the engine-committed prefix")
      // a takeover resumes strictly after the committed prefix: only
      // the uncommitted record 9 replays to the new owner
      val next = new KinesisShardConsumer("e2e", "shard-1", "w2", api, leases)
      assert(next.claim())
      QueueRamp.drop(next.queue) // fresh engine state for the new owner
      assert(next.poll() == 1, "exactly the uncommitted tail replays")
      assert(QueueRamp.slice(next.queue, 0, 1).map(_.id) == Seq("shard-1-9"))
      QueueRamp.drop(next.queue)
    } finally q.stop()
    QueueRamp.drop(consumer.queue)
  }

  test("mid-stream shard split: children claimable only after the parent drains through the engine; no record lost or duplicated") {
    val inner = new InMemoryKinesis
    midStreamSplitScenario(inner, inner, "resh-e2e", "resh")
  }

  test("mid-stream shard split through the ORDINAL BRIDGE: the full engine over opaque sequences") {
    // the aws adapter's production path (OrdinalBridgedKinesis over an
    // opaque-sequence service): lease election, engine checkpoints,
    // reshard drain gate, exactly-once — all through Long ordinals the
    // bridge translates. The parent's ending sequence is MaxValue until
    // a consumer OBSERVES the drain (unlike the in-memory double, which
    // knows it immediately) — the gate must compose with both.
    val inner = new InMemoryKinesis
    val api = new OrdinalBridgedKinesis(
      new OpaqueInMemoryKinesis(inner), new InMemorySequenceBridge)
    midStreamSplitScenario(api, inner, "resh-br-e2e", "reshbr")
  }

  /** The reshard e2e scenario over any [[KinesisApi]]: `api` is what
    * the engine consumes through; `inner` is the storage the producer
    * appends/splits on (the same object when un-bridged). */
  private def midStreamSplitScenario(api: KinesisApi, inner: InMemoryKinesis,
      stream: String, tag: String): Unit = {
    val leases = new InMemoryLeaseTable
    inner.createShard(stream, "shard-1")
    (1 to 6).foreach(i => inner.append(stream, "shard-1", s"k$i", s"rec$i"))
    // bootstrap: the parentless shard registers through the same path
    // children will use later
    assert(KinesisResharding.registerStartable(stream, "w1", api, leases) == Seq("shard-1"))
    val parent = new KinesisShardConsumer(stream, "shard-1", "w1", api, leases)
    QueueRamp.drop(parent.queue)
    assert(parent.poll() == 6)
    val qP = streamOf(parent.queue, s"${tag}_parent")
    val children = Seq("shard-1a", "shard-1b")
    val childConsumers = children.map(id => new KinesisShardConsumer(stream, id, "w1", api, leases))
    var childQs = Seq.empty[org.apache.spark.sql.streaming.StreamingQuery]
    try {
      qP.processAllAvailable()
      assert(spark.table(s"${tag}_parent").count() == 6)
      // MID-STREAM: two more records land, then the reshard fires while
      // the query keeps running; post-split traffic goes to the children
      inner.append(stream, "shard-1", "k7", "rec7")
      inner.append(stream, "shard-1", "k8", "rec8")
      inner.splitShard(stream, "shard-1", "shard-1a", "shard-1b")
      inner.append(stream, "shard-1a", "k9", "rec9")
      inner.append(stream, "shard-1b", "k10", "rec10")
      inner.append(stream, "shard-1b", "k11", "rec11")
      // the reshard boundary: children must NOT be claimable while the
      // parent still has an unconsumed tail (records 7,8)
      assert(KinesisResharding.registerStartable(stream, "w1", api, leases).isEmpty,
        "children registered before the parent drained")
      assert(!KinesisResharding.drained(stream, "shard-1", api, leases))
      // the owner drains the tail through the REAL engine
      assert(parent.poll() == 2)
      qP.processAllAvailable()
      assert(spark.table(s"${tag}_parent").count() == 8)
      // the next poll sees the closed shard fully enqueued and flags the
      // queue as draining; the running query's idle triggers then
      // finalize the tail's source ack — without the drain flag this
      // commit NEVER arrives (no batch will ever construct again) and
      // the handoff stalls with children forever unclaimable
      assert(parent.poll() == 0)
      pollUntil("engine acks the closed parent's tail")(
        QueueRamp.committed(parent.queue) == 8L)
      assert(parent.checkpoint())
      assert(KinesisResharding.drained(stream, "shard-1", api, leases))
      // now — and only now — the children register and consume
      assert(KinesisResharding.registerStartable(stream, "w1", api, leases).sorted == children)
      childConsumers.foreach(c => QueueRamp.drop(c.queue))
      assert(childConsumers.map(_.poll()).sum == 3)
      childQs = childConsumers.zipWithIndex.map { case (c, i) =>
        streamOf(c.queue, s"${tag}_child_$i") }
      childQs.foreach(_.processAllAvailable())
      // exactly-once across the reshard: every produced record appears
      // exactly once across the parent + child sinks
      import spark.implicits._
      val got = Seq(s"${tag}_parent", s"${tag}_child_0", s"${tag}_child_1")
        .flatMap(t => spark.table(t).select("id", "content")
          .as[(String, String)].collect())
      val want = (1 to 8).map(i => s"shard-1-$i" -> s"rec$i") ++
        Seq("shard-1a-1" -> "rec9", "shard-1b-1" -> "rec10", "shard-1b-2" -> "rec11")
      assert(got.size == want.size, s"lost or duplicated records: got ${got.size}")
      assert(got.toSet == want.toSet)
    } finally {
      qP.stop(); childQs.foreach(_.stop())
      QueueRamp.drop(parent.queue); childConsumers.foreach(c => QueueRamp.drop(c.queue))
    }
  }

  test("crash mid-stream: the committed prefix sticks, only the tail replays") {
    val api = new InMemoryKinesis
    val leases = new InMemoryLeaseTable
    (1 to 6).foreach(i => api.append("e2e2", "shard-1", s"k$i", s"rec$i"))
    val a = new KinesisShardConsumer("e2e2", "shard-1", "wA", api, leases)
    QueueRamp.drop(a.queue)
    assert(a.claim())
    assert(a.poll(limit = 4) == 4)

    val q = streamOf(a.queue, "kin_crash")
    try {
      q.processAllAvailable() // batch 0 sinks records 1..4
      assert(spark.table("kin_crash").count() == 4)
      assert(a.poll() == 2)   // records 5,6 arrive
      q.processAllAvailable() // batch 1 sinks them AND delivers commit(batch 0)
      assert(eventually()(QueueRamp.committed(a.queue) == 4L))
      assert(a.checkpoint())
      assert(leases.get("shard-1").get.checkpoint == 4L)
    } finally q.stop() // CRASH: batch 1's commit never arrives
    QueueRamp.drop(a.queue) // wA's engine state dies with it

    // takeover: records 5,6 were SUNK by batch 1 but never
    // source-committed — they replay to the new owner (at-least-once,
    // the reference's own guarantee level); 1..4 never replay
    val b = new KinesisShardConsumer("e2e2", "shard-1", "wB", api, leases)
    assert(b.claim())
    assert(b.poll() == 2, "exactly the uncommitted tail (5,6) replays")
    assert(QueueRamp.slice(b.queue, 0, 2).map(_.id) == Seq("shard-1-5", "shard-1-6"))
    QueueRamp.commitUpTo(b.queue, QueueRamp.size(b.queue))
    assert(b.checkpoint())
    assert(leases.get("shard-1").get.checkpoint == 6L)
  }
}
