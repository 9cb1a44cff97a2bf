package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.RetryingBatchWriter

/** Seam-conformance kit for the cloud client traits: the BEHAVIORAL
  * contract [[KinesisShardConsumer]], [[KinesisResharding]],
  * [[SqsPoller]] and [[graft.sinks.RetryingBatchWriter]] rely on,
  * expressed as an abstract suite any implementation must pass.
  *
  * Two purposes:
  *  - the in-memory doubles (the local/test substrate every other spec
  *    builds on) are themselves gated here, unconditionally;
  *  - a production aws-sdk-v2 adapter is validated by SUBCLASSING each
  *    abstract suite with a fixture built on the real SDK, gated on
  *    `GRAFT_AWS_E2E=1` (tests no-op silently otherwise — CI without
  *    credentials stays green). The sandbox this library is built in
  *    has no SDK jars (offline resolver), so the adapter itself ships
  *    with a production build; its method mapping is fully pinned by
  *    the trait docs + this contract:
  *
  *    KinesisApi ← software.amazon.awssdk.services.kinesis.KinesisClient
  *      listShards/describeShards ← ListShards (ShardId, ParentShardId,
  *        AdjacentParentShardId → parents; SequenceNumberRange
  *        .EndingSequenceNumber → endingSequence)
  *      getRecords ← GetShardIterator(AFTER_SEQUENCE_NUMBER) +
  *        GetRecords(Limit) (MillisBehindLatest → the lag gauge)
  *      putRecords ← PutRecords (per-record ErrorCode →
  *        Retryable/Hard outcomes, request order preserved)
  *    SqsApi ← software.amazon.awssdk.services.sqs.SqsClient
  *      ensureQueue ← GetQueueUrl + CreateQueue on NonExistentQueue
  *      receive ← ReceiveMessage(MaxNumberOfMessages, VisibilityTimeout)
  *      delete ← DeleteMessage(ReceiptHandle) (false on
  *        ReceiptHandleIsInvalid)
  *      send ← SendMessage (the 256 KB bound pre-checked client-side)
  *
  * Fixture hooks absorb the few places where the double is strictly
  * deterministic and AWS is not (exact lag values, clock control);
  * every correctness-bearing behavior is asserted identically.
  */
trait KinesisConformanceFixture {
  def api: KinesisApi
  /** Name of a stream that exists with exactly ONE open shard. */
  def stream: String
  /** Perform a split of `parent`; returns the two child shard ids. */
  def split(parent: String): (String, String)
  /** True when the implementation reports EXACT record-count lag (the
    * in-memory double); AWS reports wall-clock ms and only `>= 0` +
    * convergence-to-0 are contractual. */
  def exactLag: Boolean = true
}

abstract class KinesisApiConformance(impl: String) extends AnyFunSuite {
  /** Provide a fresh fixture, or None to skip (e.g. GRAFT_AWS_E2E unset). */
  protected def fixture(): Option[KinesisConformanceFixture]

  private def withF(body: KinesisConformanceFixture => Unit): Unit =
    fixture() match {
      case Some(f) => body(f)
      case None    => info(s"$impl fixture unavailable (env gate) — skipped")
    }

  test(s"[$impl] open shard: no ending sequence, listShards/describeShards agree") {
    withF { f =>
      val infos = f.api.describeShards(f.stream)
      assert(infos.map(_.shardId) == f.api.listShards(f.stream))
      assert(infos.count(_.endingSequence.isEmpty) == 1, "exactly one open shard")
      assert(infos.filter(_.endingSequence.isEmpty).forall(_.parents.isEmpty))
    }
  }

  test(s"[$impl] putRecords → getRecords: in-order, strictly-after semantics, limit respected") {
    withF { f =>
      val outcomes = f.api.putRecords(f.stream,
        (1 to 5).map(i => KinesisApi.PutEntry("pk", s"data$i")))
      assert(outcomes.size == 5 && outcomes.forall(_ == RetryingBatchWriter.Ok))
      val shard = f.api.describeShards(f.stream).find(_.endingSequence.isEmpty).get.shardId
      val all = f.api.getRecords(f.stream, shard, afterSequence = 0L, limit = 100)
      assert(all.records.map(_.data) == (1 to 5).map(i => s"data$i"))
      val seqs = all.records.map(_.sequenceNumber)
      assert(seqs == seqs.sorted && seqs.distinct == seqs, "monotone unique sequences")
      // strictly after: resuming from the 2nd record's sequence yields 3..5
      val tail = f.api.getRecords(f.stream, shard, seqs(1), limit = 100)
      assert(tail.records.map(_.data) == Seq("data3", "data4", "data5"))
      // limit caps the fetch; the remainder arrives on the next call
      val page = f.api.getRecords(f.stream, shard, 0L, limit = 2)
      assert(page.records.map(_.data) == Seq("data1", "data2"))
      if (f.exactLag) assert(page.millisBehindLatest == 3L)
      else assert(page.millisBehindLatest >= 0L)
      // caught-up poll: empty, lag converges to 0
      val head = f.api.getRecords(f.stream, shard, seqs.last, limit = 100)
      assert(head.records.isEmpty)
      if (f.exactLag) assert(head.millisBehindLatest == 0L)
    }
  }

  test(s"[$impl] getRecords on an unknown shard throws (loud-failure path)") {
    withF { f =>
      intercept[Exception] {
        f.api.getRecords(f.stream, "no-such-shard", 0L, 10)
      }
    }
  }

  test(s"[$impl] split: parent closes at its head, children carry the parent link, writes re-route") {
    withF { f =>
      f.api.putRecords(f.stream, (1 to 3).map(i => KinesisApi.PutEntry("pk", s"pre$i")))
      val parent = f.api.describeShards(f.stream).find(_.endingSequence.isEmpty).get.shardId
      val parentHead = f.api.getRecords(f.stream, parent, 0L, 100)
        .records.map(_.sequenceNumber).max
      val (a, b) = f.split(parent)
      val infos = f.api.describeShards(f.stream).map(i => i.shardId -> i).toMap
      // the parent is closed AT its head: ending covers every written
      // sequence, so "checkpoint >= ending" is reachable by a consumer
      assert(infos(parent).endingSequence.exists(_ >= parentHead))
      assert(infos(a).endingSequence.isEmpty && infos(b).endingSequence.isEmpty)
      assert(infos(a).parents.contains(parent) && infos(b).parents.contains(parent))
      // the parent's records stay readable after the close (retention)
      assert(f.api.getRecords(f.stream, parent, 0L, 100).records.size == 3)
      // post-split writes land on open shards only
      val out = f.api.putRecords(f.stream,
        (1 to 4).map(i => KinesisApi.PutEntry(s"k$i", s"post$i")))
      assert(out.forall(_ == RetryingBatchWriter.Ok))
      val landed = Seq(a, b).flatMap(s =>
        f.api.getRecords(f.stream, s, 0L, 100).records.map(_.data))
      assert(landed.sorted == (1 to 4).map(i => s"post$i"))
      assert(f.api.getRecords(f.stream, parent, parentHead, 100).records.isEmpty,
        "a closed shard takes no post-split writes")
    }
  }
}

trait SqsConformanceFixture {
  def api: SqsApi
  /** A queue name unused before this fixture. */
  def queue: String
  /** Let `ms` of visibility-clock time pass (instant for the injected
    * in-memory clock; Thread.sleep for the real service). */
  def advanceClock(ms: Long): Unit
}

abstract class SqsApiConformance(impl: String) extends AnyFunSuite {
  protected def fixture(): Option[SqsConformanceFixture]

  private def withF(body: SqsConformanceFixture => Unit): Unit =
    fixture() match {
      case Some(f) => body(f)
      case None    => info(s"$impl fixture unavailable (env gate) — skipped")
    }

  test(s"[$impl] ensureQueue: created once, found after") {
    withF { f =>
      assert(f.api.ensureQueue(f.queue), "first ensure creates")
      assert(!f.api.ensureQueue(f.queue), "second ensure finds")
    }
  }

  test(s"[$impl] send/receive/visibility/delete lifecycle") {
    withF { f =>
      f.api.ensureQueue(f.queue)
      (1 to 3).foreach(i => f.api.send(f.queue, s"body$i"))
      val got = f.api.receive(f.queue, max = 10, visibilityTimeoutMs = 30000L)
      assert(got.map(_.body).sorted == Seq("body1", "body2", "body3"))
      assert(got.map(_.receiptHandle).distinct.size == 3, "per-delivery handles")
      // hidden while the visibility timeout runs
      assert(f.api.receive(f.queue, 10, 30000L).isEmpty)
      // delete two with their CURRENT handles
      assert(f.api.delete(f.queue, got(0).receiptHandle))
      assert(f.api.delete(f.queue, got(1).receiptHandle))
      // expiry redelivers exactly the undeleted one, with a NEW handle
      f.advanceClock(31000L)
      val again = f.api.receive(f.queue, 10, 30000L)
      assert(again.map(_.body) == Seq(got(2).body))
      assert(again.head.receiptHandle != got(2).receiptHandle)
      // the superseded handle is stale; the new one deletes
      assert(!f.api.delete(f.queue, got(2).receiptHandle))
      assert(f.api.delete(f.queue, again.head.receiptHandle))
      // nothing left, even past another expiry window
      f.advanceClock(31000L)
      assert(f.api.receive(f.queue, 10, 30000L).isEmpty)
    }
  }

  test(s"[$impl] max caps a receive; remaining messages stay visible") {
    withF { f =>
      f.api.ensureQueue(f.queue)
      (1 to 5).foreach(i => f.api.send(f.queue, s"m$i"))
      val first = f.api.receive(f.queue, max = 2, visibilityTimeoutMs = 30000L)
      assert(first.size == 2)
      val rest = f.api.receive(f.queue, max = 10, visibilityTimeoutMs = 30000L)
      assert(rest.size == 3, "uncapped remainder still visible")
      assert((first ++ rest).map(_.body).sorted == (1 to 5).map(i => s"m$i"))
    }
  }

  test(s"[$impl] 256 KB bound enforced on send") {
    withF { f =>
      f.api.ensureQueue(f.queue)
      intercept[Exception] { f.api.send(f.queue, "x" * (256 * 1024 + 1)) }
      f.api.send(f.queue, "y" * 1024) // under the bound: accepted
      assert(f.api.receive(f.queue, 10, 30000L).exists(_.body.startsWith("y")))
    }
  }
}

/** Conformance for the lease-election store: the CAS semantics
  * [[ShardLeaseCoordinator]] builds takeover/heartbeat on. A DynamoDB
  * adapter maps: get ← GetItem(ConsistentRead=true), scan ← Scan,
  * putIfAbsent ← PutItem(ConditionExpression
  * attribute_not_exists(shardId)), putIf ← PutItem(ConditionExpression
  * over the stored attributes the predicate reads) — with
  * ConditionalCheckFailedException returned as `false`, never thrown.
  * The concurrency tests are the contract's heart: condition failure
  * must be atomic with the replace (a read-check-write adapter that
  * races loses leases). */
abstract class LeaseTableConformance(impl: String) extends AnyFunSuite {
  protected def fixture(): Option[LeaseTable]

  private def withF(body: LeaseTable => Unit): Unit =
    fixture() match {
      case Some(t) => body(t)
      case None    => info(s"$impl fixture unavailable (env gate) — skipped")
    }

  test(s"[$impl] putIfAbsent: first registration wins, record visible via get and scan") {
    withF { t =>
      val lease = ShardLease("s-1", checkpoint = 0L, "w1", heartbeat = 0L)
      assert(t.putIfAbsent(lease), "first put must create")
      assert(!t.putIfAbsent(lease.copy(workerId = "w2")), "second put must refuse")
      assert(t.get("s-1").contains(lease), "get must read the winner's record")
      assert(t.scan().contains(lease))
      assert(t.get("s-2").isEmpty)
    }
  }

  test(s"[$impl] putIf: condition sees the STORED record; failure mutates nothing") {
    withF { t =>
      val v0 = ShardLease("s-1", 5L, "w1", 3L)
      t.putIfAbsent(v0)
      // condition false -> no mutation, false returned (never thrown)
      assert(!t.putIf(v0.copy(workerId = "w2"))(old => old.checkpoint == 99L))
      assert(t.get("s-1").contains(v0), "failed CAS must not mutate")
      // condition evaluated against the stored value, not the new one
      assert(t.putIf(v0.copy(workerId = "w2", checkpoint = 8L))(old =>
        old.checkpoint == 5L && old.workerId == "w1"))
      assert(t.get("s-1").exists(l => l.workerId == "w2" && l.checkpoint == 8L))
      // putIf on a missing record is false, not an upsert
      assert(!t.putIf(ShardLease("ghost", 0L, "w1", 0L))(_ => true))
      assert(t.get("ghost").isEmpty)
    }
  }

  test(s"[$impl] concurrent putIfAbsent: exactly one creator wins") {
    withF { t =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val wins = (1 to 16).map { i =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = t.putIfAbsent(ShardLease("race", 0L, s"w$i", 0L))
          })
        }.count(_.get())
        assert(wins == 1, s"$wins creators won the same shard")
      } finally pool.shutdown()
    }
  }

  test(s"[$impl] concurrent CAS increments lose no update (linearizable conditional put)") {
    withF { t =>
      t.putIfAbsent(ShardLease("ctr", 0L, "w", 0L))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val Attempts = 40
        val succeeded = (1 to Attempts).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = {
              val cur = t.get("ctr").get
              t.putIf(cur.copy(checkpoint = cur.checkpoint + 1))(old =>
                old.checkpoint == cur.checkpoint)
            }
          })
        }.count(_.get())
        assert(t.get("ctr").get.checkpoint == succeeded.toLong,
          "every successful CAS must be reflected exactly once (no lost updates)")
        assert(succeeded >= 1)
      } finally pool.shutdown()
    }
  }
}

/** The in-memory doubles run the contract unconditionally. */
class InMemoryKinesisConformance extends KinesisApiConformance("in-memory") {
  override protected def fixture(): Option[KinesisConformanceFixture] =
    Some(new KinesisConformanceFixture {
      private val k = new InMemoryKinesis
      private var nextChild = 0
      k.createShard("conf-stream", "shard-0")
      override val api: KinesisApi = k
      override val stream: String = "conf-stream"
      override def split(parent: String): (String, String) = {
        val (a, b) = (s"child-$nextChild-a", s"child-$nextChild-b")
        nextChild += 1
        k.splitShard(stream, parent, a, b)
        (a, b)
      }
    })
}

class InMemoryLeaseTableConformance extends LeaseTableConformance("in-memory") {
  override protected def fixture(): Option[LeaseTable] = Some(new InMemoryLeaseTable)
}

class InMemorySqsConformance extends SqsApiConformance("in-memory") {
  override protected def fixture(): Option[SqsConformanceFixture] =
    Some(new SqsConformanceFixture {
      private var now = 0L
      override val api: SqsApi = new InMemorySqs(clockMs = () => now)
      override val queue: String = s"conf-q-${System.nanoTime()}"
      override def advanceClock(ms: Long): Unit = now += ms
    })
}
