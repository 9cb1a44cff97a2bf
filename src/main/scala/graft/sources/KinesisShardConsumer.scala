package graft.sources

/** Per-shard Kinesis consumer loop over the [[KinesisApi]] client seam —
  * the protocol of the reference's shard consumer threads
  * (`contrib/amazon_kinesis/ramps.py:186-315`), re-expressed as
  * deterministic pull steps feeding a [[QueueRamp]] queue (which the
  * DSv2 source turns into micro-batches with commit-on-sink-success):
  *
  *  - '''lease gate''': every poll verifies ownership in the
  *    [[LeaseTable]]; a lost lease stops consumption mid-stream with no
  *    cleanup needed (the new owner resumes from the checkpoint).
  *  - '''backpressure''': polls stop while uncompleted (enqueued minus
  *    engine-committed) messages exceed `maxUncompleted` — the
  *    reference's 3,000-per-shard bound (`ramps.py:264-288`).
  *  - '''checkpoint = min uncompleted''': [[checkpoint]] publishes the
  *    highest sequence whose queue offset the engine has committed.
  *    Because queue commits are prefix-contiguous, this is exactly the
  *    reference's min(uncompleted)−1 rule (`ramps.py:250-262`) — a
  *    takeover replays only uncommitted records (at-least-once).
  *  - '''loud failures''': a throwing client routes to `onFailure`
  *    (default: stderr with traceback) and the loop survives — the
  *    reference re-inits its consumer on error and keeps going.
  *
  * Pure logic over the seams: ShardLeaseConsumerSpec drives it against
  * [[InMemoryKinesis]] + [[InMemoryLeaseTable]] exactly as the
  * reference's tests drive mocked AWS; production plugs an SDK-backed
  * [[KinesisApi]] and a DynamoDB-backed [[LeaseTable]] with no change
  * here.
  */
final class KinesisShardConsumer(
    stream: String,
    shardId: String,
    workerId: String,
    api: KinesisApi,
    leases: LeaseTable,
    maxUncompleted: Int = 3000,
    onFailure: Throwable => Unit = KinesisShardConsumer.stderrReporter,
    closedCheckIntervalMs: Long = 10000L) {

  /** One Spark-side queue per shard keeps offsets shard-linear, so the
    * queue's committed prefix maps 1:1 onto a shard checkpoint. */
  val queue: String = s"$stream-$shardId"

  /** (queue offset, sequence) of enqueued-but-not-yet-checkpointed
    * records; pruned as checkpoints advance. */
  private val inflight = scala.collection.mutable.ArrayDeque.empty[(Long, Long)]
  private var lastEnqueuedSeq: Long = Long.MinValue
  private var lastMillisBehindVal: Long = 0L
  // 0 (not MinValue — the subtraction would overflow): the FIRST empty
  // poll may check closure immediately, the reshard-handoff path never
  // waits out the rate-limit interval
  private var lastClosedCheckMs: Long = 0L

  def owned: Boolean = leases.get(shardId).exists(_.workerId == workerId)

  /** Behind-the-head gauge from the last successful poll — the ramp's
    * `MillisecondsBehind` publication (`ramps.py:290-298`). */
  def lastMillisBehind: Long = lastMillisBehindVal

  /** Claim the shard (first registration or takeover). Resumes strictly
    * after the checkpoint the previous owner last published. */
  def claim(): Boolean = synchronized {
    val coord = new ShardLeaseCoordinator(workerId, leases)
    val ok = leases.get(shardId) match {
      case None    => coord.claimNewShard(shardId)
      case Some(_) => coord.claimShard(shardId)
    }
    if (ok) {
      lastEnqueuedSeq = leases.get(shardId).map(_.checkpoint).getOrElse(0L)
      inflight.clear()
    }
    ok
  }

  /** One pull step: ≤ `limit` records after the last enqueued sequence
    * into the queue. Returns records enqueued; 0 when not owner,
    * backpressured, or the client failed (reported, never thrown). */
  def poll(limit: Int = 500): Int = synchronized {
    if (!owned) return 0
    // owned without a claim() on THIS instance (registerStartable
    // registered the lease, or a restart where the lease survived):
    // resume from the published checkpoint, never the construction
    // sentinel — Long.MinValue is not a valid AFTER_SEQUENCE_NUMBER
    // against a real client and would re-read from the beginning here
    if (lastEnqueuedSeq == Long.MinValue)
      lastEnqueuedSeq = leases.get(shardId).map(_.checkpoint).getOrElse(0L)
    QueueRamp.ensureQueue(queue)
    val uncompleted = QueueRamp.size(queue) - QueueRamp.committed(queue)
    // admission control: never let uncompleted exceed the bound, so the
    // fetch is capped at the remaining room (≙ the reference pausing
    // its consumer thread at the 3,000 bound)
    val room = maxUncompleted - uncompleted
    if (room <= 0) return 0
    try {
      val res = api.getRecords(stream, shardId, lastEnqueuedSeq,
        math.min(limit.toLong, room).toInt)
      lastMillisBehindVal = res.millisBehindLatest
      if (res.records.isEmpty) {
        // shard closed by a reshard AND everything up to its ending
        // sequence enqueued: flag the queue as draining so the engine
        // can finalize the tail's ack without waiting for data that
        // will never arrive — the prerequisite for the lease checkpoint
        // reaching `ending` and the children becoming claimable
        // ([[KinesisResharding.registerStartable]]; KCL's SHARD_END
        // checkpoint). A tailing consumer's steady state is empty
        // polls, so the topology read is RATE-LIMITED (AWS ListShards
        // is ~100 TPS per stream and a per-shard fleet polling every
        // few hundred ms would throttle the whole stream's control
        // plane) and skipped once the flag is set — it never unsets.
        val now = System.currentTimeMillis()
        if (!QueueRamp.isDrainable(queue) &&
            now - lastClosedCheckMs >= closedCheckIntervalMs) {
          lastClosedCheckMs = now
          if (api.describeShards(stream).find(_.shardId == shardId)
              .exists(_.endingSequence.exists(_ <= lastEnqueuedSeq)))
            QueueRamp.markDrainable(queue)
        }
        0
      }
      else {
        // startOffset comes from enqueue itself (atomic under the queue
        // lock) — a separate size() read would race a concurrent
        // producer (old lease owner in the takeover window) and skew
        // the offset→sequence inflight mapping
        val startOffset = QueueRamp.enqueue(queue, res.records.map(r =>
          QueueRamp.Entry(s"$shardId-${r.sequenceNumber}", r.data,
            r.partitionKey, r.arrivalMicros)))
        res.records.zipWithIndex.foreach { case (r, i) =>
          inflight.append((startOffset + i, r.sequenceNumber))
        }
        lastEnqueuedSeq = res.records.last.sequenceNumber
        res.records.size
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try onFailure(e) catch { case scala.util.control.NonFatal(_) => () }
        0
    }
  }

  /** Publish the committed-prefix checkpoint + heartbeat. False when
    * ownership was lost (the record moved under us). */
  def checkpoint(): Boolean = synchronized {
    if (!owned) return false
    val committed = QueueRamp.committed(queue)
    var ck = leases.get(shardId).map(_.checkpoint).getOrElse(0L)
    while (inflight.nonEmpty && inflight.head._1 < committed) {
      ck = inflight.removeHead()._2
    }
    new ShardLeaseCoordinator(workerId, leases).heartbeat(shardId, ck)
  }
}

object KinesisShardConsumer {
  def stderrReporter: Throwable => Unit = { e =>
    System.err.println(s"[kinesis-consumer] poll failed: ${String.valueOf(e.getMessage)}")
    e.printStackTrace()
  }
}

/** Resharding-aware shard lifecycle — split/merge handling the
  * reference never implemented (its lease table has no parent/child
  * notion; a reshard stalls its fleet). Built from the public Kinesis
  * contract: a split/merge CLOSES the parent shard(s) at an ending
  * sequence and opens children carrying parent links; consuming a child
  * before its parents are drained reorders keys across the reshard
  * boundary and can lose the parent's uncommitted tail.
  *
  * The rule enforced here: a child's lease record is CREATED (and thus
  * the child becomes claimable at all — [[ShardLeaseCoordinator]]
  * throws [[NoLeaseRecord]] otherwise) only once every parent is
  * `complete`: closed AND lease-checkpointed to its ending sequence.
  * Children then start from checkpoint 0 (their TRIM_HORIZON — a child
  * begins empty at the reshard point, so 0 loses nothing), while the
  * parent's record stays behind as the proof its tail was consumed.
  * Replay loss is impossible: every parent record is either before the
  * parent's final checkpoint (committed by the engine) or replayed by
  * the parent's owner before `complete` flips.
  */
object KinesisResharding {

  /** Fully consumed: closed with the lease checkpoint at the end. */
  def complete(info: KinesisApi.ShardInfo, leases: LeaseTable): Boolean =
    info.endingSequence.exists(end =>
      leases.get(info.shardId).exists(_.checkpoint >= end))

  /** True once the OWNER may stop polling `shardId`: the shard is
    * closed and everything up to its end is engine-committed. */
  def drained(stream: String, shardId: String, api: KinesisApi, leases: LeaseTable): Boolean =
    api.describeShards(stream).find(_.shardId == shardId).exists(complete(_, leases))

  /** Register lease records for every startable new shard: no record
    * yet, and all parents complete (trivially so for parentless shards
    * — stream bootstrap uses the same path). Returns the shards
    * registered to `workerId`; callers race via putIfAbsent, so across
    * a fleet each child is registered exactly once. */
  def registerStartable(stream: String, workerId: String, api: KinesisApi,
      leases: LeaseTable): Seq[String] = {
    val infos = api.describeShards(stream)
    val byId = infos.map(i => i.shardId -> i).toMap
    infos.filter { s =>
      leases.get(s.shardId).isEmpty &&
        s.parents.forall(p => byId.get(p).forall(complete(_, leases)))
    }.map(_.shardId).filter { id =>
      new ShardLeaseCoordinator(workerId, leases).claimNewShard(id)
    }
  }
}

/** SQS polling loop over the [[SqsApi]] client seam — the protocol of
  * `contrib/amazon_sqs/ramps.py:8-31`: long-poll receive hides each
  * message for the visibility timeout; the engine committing the
  * micro-batch (sink success) deletes it permanently — visibility ≙
  * commit. An un-deleted message reappears after the timeout and is
  * re-enqueued: the at-least-once replay path, identical to the
  * reference's un-acked redelivery.
  *
  * Deletion rides [[QueueRamp.onCommit]], so it happens at exactly
  * engine-commit time with no polling-loop involvement.
  */
final class SqsPoller(
    sqsQueue: String,
    api: SqsApi,
    visibilityTimeoutMs: Long = 600000L, // the reference's 10 minutes
    onFailure: Throwable => Unit = KinesisShardConsumer.stderrReporter) {

  /** Spark-side queue name (distinct namespace from the SQS queue). */
  val queue: String = s"sqs-$sqsQueue"

  /** queue offset → receipt handle of the delivery that enqueued it.
    * Concurrent-safe: the poll loop writes from the driver/scheduler
    * thread while the engine's stream-execution thread drains via the
    * commit hook. */
  private val handles = new java.util.concurrent.ConcurrentHashMap[Long, String]()

  QueueRamp.ensureQueue(queue)
  QueueRamp.onCommit(queue) { (from, until) =>
    (from until until).foreach { off =>
      Option(handles.remove(off)).foreach { h =>
        try api.delete(sqsQueue, h)
        catch { case scala.util.control.NonFatal(e) =>
          try onFailure(e) catch { case scala.util.control.NonFatal(_) => () } }
      }
    }
  }

  /** One receive step (≙ one `next()` iteration): up to `max` visible
    * messages into the queue. Returns messages enqueued; failures are
    * reported, never thrown (the poll cadence survives an outage). */
  def pollOnce(max: Int = 10): Int =
    try {
      api.ensureQueue(sqsQueue)
      val msgs = api.receive(sqsQueue, max, visibilityTimeoutMs)
      if (msgs.nonEmpty) {
        // atomic offset from enqueue — see KinesisShardConsumer.poll
        val startOffset = QueueRamp.enqueue(queue, msgs.map(m =>
          QueueRamp.Entry(m.messageId, m.body, m.messageId, 0L)))
        msgs.zipWithIndex.foreach { case (m, i) =>
          handles.put(startOffset + i, m.receiptHandle)
        }
      }
      msgs.size
    } catch {
      case scala.util.control.NonFatal(e) =>
        try onFailure(e) catch { case scala.util.control.NonFatal(_) => () }
        0
    }
}
