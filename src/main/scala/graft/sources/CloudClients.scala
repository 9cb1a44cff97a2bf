package graft.sources

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer

import graft.sinks.RetryingBatchWriter

/** Injectable cloud-client seams for the queue connectors — the point
  * where a real AWS SDK client plugs in, mirroring how the reference
  * injects its mocked control table and connections in
  * `/root/reference/motorway/tests/test_amazon_kinesis.py:6-188` while
  * production code talks to real AWS
  * (`contrib/amazon_kinesis/ramps.py:186-315`).
  *
  * The connectors ([[KinesisShardConsumer]], [[SqsPoller]],
  * [[ShardLeaseCoordinator]]) are pure protocol logic over these traits
  * plus [[LeaseTable]]; the in-memory implementations below are correct
  * single-JVM doubles AND the deterministic test substrate. A
  * production deployment implements each trait with the AWS SDK calls
  * named on the methods — no connector logic changes.
  */
object KinesisApi {
  /** One stream record (≙ Kinesis Record: sequence number is the shard
    * position, data arrives base64 in AWS — a String here). */
  final case class Record(sequenceNumber: Long, partitionKey: String,
      data: String, arrivalMicros: Long)
  final case class GetRecordsResult(records: Seq[Record], millisBehindLatest: Long)
  final case class PutEntry(partitionKey: String, data: String)
  /** Shard topology entry (≙ ListShards' Shard: ParentShardId /
    * AdjacentParentShardId collapse to `parents`; a closed shard —
    * split or merged away — carries its EndingSequenceNumber). */
  final case class ShardInfo(shardId: String, parents: Seq[String],
      endingSequence: Option[Long])
}

/** ≙ the AWS Kinesis surface the reference's ramps/intersections use:
  * DescribeStream/ListShards, GetShardIterator+GetRecords, PutRecords
  * (`contrib/amazon_kinesis/ramps.py:186-315`, `intersections.py:10-69`). */
trait KinesisApi {
  /** ≙ ListShards: all shard ids on the stream (open and closed). */
  def listShards(stream: String): Seq[String]
  /** ≙ ListShards with topology: parent links + ending sequences, the
    * inputs of resharding-aware consumption ([[KinesisResharding]]). */
  def describeShards(stream: String): Seq[KinesisApi.ShardInfo]
  /** ≙ GetShardIterator(AFTER_SEQUENCE_NUMBER)+GetRecords: records
    * strictly after `afterSequence`, at most `limit`, plus the
    * behind-latest gauge the ramp publishes as its lag metric. */
  def getRecords(stream: String, shardId: String, afterSequence: Long,
      limit: Int): KinesisApi.GetRecordsResult
  /** ≙ PutRecords: per-record outcomes in request order, feeding
    * [[graft.sinks.RetryingBatchWriter]]'s partial-retry loop. */
  def putRecords(stream: String, records: Seq[KinesisApi.PutEntry]): Seq[RetryingBatchWriter.Outcome]
}

object SqsApi {
  /** ≙ an SQS message: `receiptHandle` is per-delivery (delete needs
    * the handle from the LATEST receive, exactly like AWS). */
  final case class ReceivedMessage(messageId: String, receiptHandle: String, body: String)
}

/** ≙ the AWS SQS surface of `contrib/amazon_sqs/{ramps,intersections,
  * mixins}.py`: get-or-create queue, long-poll receive with a
  * visibility timeout, delete-on-success, bounded send. */
trait SqsApi {
  /** ≙ init_queue (`mixins.py:6-19`): true when created by this call. */
  def ensureQueue(queue: String): Boolean
  /** ≙ receive_messages(MaxNumberOfMessages≤10, VisibilityTimeout):
    * returns up to `max` visible messages and hides them for
    * `visibilityTimeoutMs` (un-deleted messages reappear — the replay
    * path when a batch fails before commit). */
  def receive(queue: String, max: Int, visibilityTimeoutMs: Long): Seq[SqsApi.ReceivedMessage]
  /** ≙ delete_message: permanent ack by receipt handle. False when the
    * handle is stale (message already redelivered to someone else). */
  def delete(queue: String, receiptHandle: String): Boolean
  /** ≙ send_message. Implementations must enforce the 256 KB bound
    * (`contrib/amazon_sqs/utils.py:4-13`). */
  def send(queue: String, body: String): Unit
}

/** Thread-safe in-memory Kinesis — the test double and single-JVM
  * implementation. Sequence numbers are per-shard monotonic appends. */
final class InMemoryKinesis extends KinesisApi {
  private final class Shard {
    val records = new ArrayBuffer[KinesisApi.Record]()
    var parents: Seq[String] = Nil
    var ending: Option[Long] = None // Some(maxSeq) once closed by a reshard
  }
  private val shards = new ConcurrentHashMap[(String, String), Shard]()
  private val streams = new ConcurrentHashMap[String, ArrayBuffer[String]]()

  def createShard(stream: String, shardId: String, parents: Seq[String] = Nil): Unit = {
    streams.computeIfAbsent(stream, _ => new ArrayBuffer[String]())
      .synchronized { val s = streams.get(stream); if (!s.contains(shardId)) s += shardId }
    val sh = shards.computeIfAbsent((stream, shardId), _ => new Shard)
    sh.synchronized { if (parents.nonEmpty) sh.parents = parents }
  }

  private def close(stream: String, shardId: String): Unit = {
    val sh = shards.get((stream, shardId))
    sh.synchronized { sh.ending = Some(sh.records.size.toLong) }
  }

  /** ≙ SplitShard: the parent closes at its current head; two children
    * open with the parent link. Post-split appends land on children. */
  def splitShard(stream: String, parent: String, childA: String, childB: String): Unit = {
    close(stream, parent)
    createShard(stream, childA, parents = Seq(parent))
    createShard(stream, childB, parents = Seq(parent))
  }

  /** ≙ MergeShards: both parents close; one child opens linked to both
    * (ParentShardId + AdjacentParentShardId). */
  def mergeShards(stream: String, parentA: String, parentB: String, child: String): Unit = {
    close(stream, parentA)
    close(stream, parentB)
    createShard(stream, child, parents = Seq(parentA, parentB))
  }

  /** Producer-side append (tests / local pipelines). Sequences start at
    * 1 so checkpoint 0 (a fresh lease) reads the shard from the top —
    * "strictly after 0" is everything. */
  def append(stream: String, shardId: String, partitionKey: String, data: String,
      arrivalMicros: Long = 0L): Long = {
    createShard(stream, shardId)
    val sh = shards.get((stream, shardId))
    sh.synchronized {
      require(sh.ending.isEmpty, s"shard $shardId is closed (resharded away)")
      val seq = sh.records.size.toLong + 1
      sh.records += KinesisApi.Record(seq, partitionKey, data, arrivalMicros)
      seq
    }
  }

  override def listShards(stream: String): Seq[String] =
    Option(streams.get(stream)).map(s => s.synchronized(s.toVector)).getOrElse(Vector.empty)

  override def describeShards(stream: String): Seq[KinesisApi.ShardInfo] =
    listShards(stream).map { id =>
      val sh = shards.get((stream, id))
      sh.synchronized(KinesisApi.ShardInfo(id, sh.parents, sh.ending))
    }

  override def getRecords(stream: String, shardId: String, afterSequence: Long,
      limit: Int): KinesisApi.GetRecordsResult = {
    val sh = Option(shards.get((stream, shardId)))
      .getOrElse(throw new NoSuchElementException(s"no shard $stream/$shardId"))
    sh.synchronized {
      val from = math.max(0L, afterSequence).toInt // seq n sits at index n-1
      val recs = sh.records.slice(from, from + limit).toVector
      KinesisApi.GetRecordsResult(recs, millisBehindLatest =
        math.max(0, sh.records.size - (from + recs.size)).toLong)
    }
  }

  override def putRecords(stream: String,
      records: Seq[KinesisApi.PutEntry]): Seq[RetryingBatchWriter.Outcome] =
  {
    // route by partition key hash over the stream's OPEN shards (AWS
    // hashes the key onto an open shard's hash-key range; closed shards
    // never take writes); one topology read per batch, not per record
    val ss = describeShards(stream).filter(_.endingSequence.isEmpty).map(_.shardId)
    records.map { e =>
      if (ss.isEmpty) RetryingBatchWriter.Hard(s"stream $stream has no open shards")
      else {
        val shard = ss(math.floorMod(e.partitionKey.hashCode, ss.size))
        // a shard closed by a concurrent reshard between the topology
        // snapshot and this append is a per-record retryable outcome
        // (the caller re-routes on retry), never a mid-batch throw —
        // putRecords' contract is one outcome per record
        try { append(stream, shard, e.partitionKey, e.data); RetryingBatchWriter.Ok }
        catch { case _: IllegalArgumentException => RetryingBatchWriter.Retryable }
      }
    }
  }
}

/** Thread-safe in-memory SQS with real visibility-timeout semantics —
  * the test double and single-JVM implementation. Time is injected so
  * specs advance visibility deterministically. */
final class InMemorySqs(clockMs: () => Long = () => System.currentTimeMillis()) extends SqsApi {
  private final class Msg(val messageId: String, val body: String) {
    var invisibleUntilMs: Long = Long.MinValue
    var receiptHandle: String = ""
    var deleted: Boolean = false
  }
  private final class Queue { val msgs = new ArrayBuffer[Msg]() }
  private val queues = new ConcurrentHashMap[String, Queue]()
  private val handleCounter = new java.util.concurrent.atomic.AtomicLong(0)

  override def ensureQueue(queue: String): Boolean = {
    var created = false
    queues.computeIfAbsent(queue, { _ => created = true; new Queue })
    created
  }

  override def send(queue: String, body: String): Unit = {
    require(body.getBytes("UTF-8").length <= 256 * 1024,
      s"SQS message exceeds 256 KB (contrib/amazon_sqs/utils.py:4-13)")
    ensureQueue(queue)
    val q = queues.get(queue)
    q.synchronized { q.msgs += new Msg(s"m${q.msgs.size}", body) }
  }

  override def receive(queue: String, max: Int,
      visibilityTimeoutMs: Long): Seq[SqsApi.ReceivedMessage] = {
    ensureQueue(queue)
    val q = queues.get(queue)
    val now = clockMs()
    q.synchronized {
      q.msgs.iterator
        .filter(m => !m.deleted && m.invisibleUntilMs <= now)
        .take(max)
        .map { m =>
          m.invisibleUntilMs = now + visibilityTimeoutMs
          m.receiptHandle = s"rh-${handleCounter.getAndIncrement()}"
          SqsApi.ReceivedMessage(m.messageId, m.receiptHandle, m.body)
        }.toVector
    }
  }

  override def delete(queue: String, receiptHandle: String): Boolean = {
    val q = queues.get(queue)
    if (q == null) return false
    q.synchronized {
      // deletes succeed with the LATEST delivery's handle even after
      // the visibility timeout expired (AWS behavior — an engine commit
      // slower than the timeout must still be able to delete); only a
      // handle from a SUPERSEDED delivery is stale, because each
      // receive overwrites receiptHandle
      q.msgs.find(m => m.receiptHandle == receiptHandle && !m.deleted) match {
        case Some(m) => m.deleted = true; true
        case None    => false
      }
    }
  }

  /** Visible + invisible (not deleted) count — test observability. */
  def remaining(queue: String): Int = {
    val q = queues.get(queue)
    if (q == null) 0 else q.synchronized(q.msgs.count(!_.deleted))
  }
}
