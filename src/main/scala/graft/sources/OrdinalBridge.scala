package graft.sources

import graft.sinks.RetryingBatchWriter

/** The opaque-sequence Kinesis surface — what AWS actually speaks:
  * sequence numbers are ~186-bit decimal STRINGS (monotone per shard,
  * otherwise opaque), positions resume via shard iterators, and a
  * closed shard signals drain by a null next-iterator. The aws-sdk-v2
  * adapter implements this 1:1 with KinesisClient calls; the in-memory
  * [[OpaqueInMemoryKinesis]] double implements it over
  * [[InMemoryKinesis]] so the ordinal-bridge algorithm below is
  * conformance-tested OFFLINE against the same behavioral kit as every
  * other seam. */
object OpaqueKinesis {
  final case class RawShard(shardId: String, parents: Seq[String], closed: Boolean)
  final case class RawRecord(sequence: String, partitionKey: String,
      data: String, arrivalMicros: Long)
  /** `nextIterator = None` ⟺ the shard is closed AND fully consumed. */
  final case class RawBatch(records: Seq[RawRecord], nextIterator: Option[String],
      millisBehindLatest: Long)
}

trait OpaqueKinesis {
  def describeRaw(stream: String): Seq[OpaqueKinesis.RawShard]
  /** ≙ GetShardIterator: TRIM_HORIZON when `afterSequence` is None,
    * AFTER_SEQUENCE_NUMBER otherwise. */
  def iteratorFor(stream: String, shardId: String, afterSequence: Option[String]): String
  /** ≙ GetRecords(Limit) on an iterator from [[iteratorFor]] (or a
    * previous batch's `nextIterator`). */
  def getRecordsRaw(iterator: String, limit: Int): OpaqueKinesis.RawBatch
  /** ≙ PutRecords (per-record outcomes, request order). */
  def putRecordsRaw(stream: String, records: Seq[KinesisApi.PutEntry]): Seq[RetryingBatchWriter.Outcome]
}

/** Durable (ordinal → opaque sequence) mapping per shard — the state
  * that lets the engine's Long checkpoints resume an opaque-sequence
  * stream across restarts and worker takeovers. The aws adapter backs
  * this with a DynamoDB table (BatchWriteItem + TTL; see
  * `aws-adapter/.../AwsKinesisApi.scala`); the in-memory
  * implementation is the test substrate. Entries are only needed for
  * the uncompleted window (bounded by admission control — the
  * reference's 3,000/shard, `contrib/amazon_kinesis/ramps.py:25`). */
trait SequenceBridgeStore {
  def record(stream: String, shardId: String, pairs: Seq[(Long, String)]): Unit
  def sequenceOf(stream: String, shardId: String, ordinal: Long): Option[String]
  def markEnd(stream: String, shardId: String, endOrdinal: Long): Unit
  def endOf(stream: String, shardId: String): Option[Long]
}

/** Thread-safe in-memory [[SequenceBridgeStore]]. */
final class InMemorySequenceBridge extends SequenceBridgeStore {
  private val seqs = new java.util.concurrent.ConcurrentHashMap[(String, String, Long), String]()
  private val ends = new java.util.concurrent.ConcurrentHashMap[(String, String), Long]()
  override def record(stream: String, shardId: String, pairs: Seq[(Long, String)]): Unit =
    pairs.foreach { case (o, s) => seqs.put((stream, shardId, o), s) }
  override def sequenceOf(stream: String, shardId: String, ordinal: Long): Option[String] =
    Option(seqs.get((stream, shardId, ordinal)))
  override def markEnd(stream: String, shardId: String, endOrdinal: Long): Unit =
    ends.put((stream, shardId), endOrdinal)
  override def endOf(stream: String, shardId: String): Option[Long] =
    Option(ends.get((stream, shardId)))
}

/** The ordinal-bridge algorithm: a [[KinesisApi]] (the engine's
  * Long-sequence seam) over ANY [[OpaqueKinesis]] + durable
  * [[SequenceBridgeStore]].
  *
  *  - ordinals are per-shard consecutive Longs assigned at consumption
  *    (`afterSequence + 1 + i`), so re-reading from the same checkpoint
  *    re-assigns the SAME ordinals (the opaque log is immutable) —
  *    idempotent under replay and consistent across worker takeovers
  *    (the bridge store is shared);
  *  - resume: ordinal 0 → TRIM_HORIZON; any other ordinal translates
  *    through the bridge (the engine only resumes from PUBLISHED
  *    checkpoints, whose bridge entries were written when the records
  *    were first consumed);
  *  - a closed shard's end is OBSERVED (null next-iterator) and
  *    recorded; until a consumer drains it, `endingSequence` reports
  *    `Long.MaxValue`, which composes with the resharding drain gate
  *    ([[KinesisResharding.isComplete]] compares the lease checkpoint
  *    against it, and an undrained parent can never have checkpointed
  *    MaxValue).
  *
  * The aws-sdk-v2 adapter instantiates exactly this class with
  * SDK-backed `opaque`/`bridge` — the algorithm itself is
  * conformance-tested offline (OrdinalBridgeSpec + the
  * [[KinesisApiConformance]] kit over [[OpaqueInMemoryKinesis]]). */
final class OrdinalBridgedKinesis(opaque: OpaqueKinesis, bridge: SequenceBridgeStore)
    extends KinesisApi {

  override def listShards(stream: String): Seq[String] =
    opaque.describeRaw(stream).map(_.shardId)

  override def describeShards(stream: String): Seq[KinesisApi.ShardInfo] =
    opaque.describeRaw(stream).map { s =>
      KinesisApi.ShardInfo(s.shardId, s.parents,
        endingSequence =
          if (!s.closed) None
          else Some(bridge.endOf(stream, s.shardId).getOrElse(Long.MaxValue)))
    }

  override def getRecords(stream: String, shardId: String, afterSequence: Long,
      limit: Int): KinesisApi.GetRecordsResult = {
    val after =
      if (afterSequence <= 0L) None
      else Some(bridge.sequenceOf(stream, shardId, afterSequence).getOrElse(
        throw new IllegalStateException(
          s"no bridge entry for $stream/$shardId ordinal $afterSequence — " +
          "the engine only resumes from published checkpoints, whose bridge " +
          "entries outlive them")))
    val it = opaque.iteratorFor(stream, shardId, after)
    val res = opaque.getRecordsRaw(it, limit)
    val recs = res.records.zipWithIndex.map { case (r, i) =>
      KinesisApi.Record(afterSequence + 1 + i, r.partitionKey, r.data, r.arrivalMicros)
    }
    if (recs.nonEmpty)
      bridge.record(stream, shardId,
        recs.map(_.sequenceNumber).zip(res.records.map(_.sequence)))
    if (res.nextIterator.isEmpty)
      bridge.markEnd(stream, shardId, afterSequence + recs.size)
    KinesisApi.GetRecordsResult(recs, res.millisBehindLatest)
  }

  override def putRecords(stream: String,
      records: Seq[KinesisApi.PutEntry]): Seq[RetryingBatchWriter.Outcome] =
    opaque.putRecordsRaw(stream, records)
}

/** AWS-shaped opaque-sequence double: delegates storage/topology to an
  * [[InMemoryKinesis]] and speaks opaque decimal STRINGS for sequence
  * numbers (zero-padded affine images of the internal Longs — strictly
  * increasing, deliberately not the ordinals themselves) and stateful
  * shard iterators, including the null-next-iterator drain signal a
  * real closed shard sends. */
final class OpaqueInMemoryKinesis(val inner: InMemoryKinesis = new InMemoryKinesis)
    extends OpaqueKinesis {
  import OpaqueKinesis._

  private def toOpaque(seq: Long): String = f"${seq * 1000003L + 777L}%024d"

  override def describeRaw(stream: String): Seq[RawShard] =
    inner.describeShards(stream).map(s =>
      RawShard(s.shardId, s.parents, s.endingSequence.isDefined))

  override def iteratorFor(stream: String, shardId: String,
      afterSequence: Option[String]): String = {
    val afterLong = afterSequence match {
      case None => 0L
      case Some(s) => (s.toLong - 777L) / 1000003L
    }
    s"$stream|$shardId|$afterLong"
  }

  override def getRecordsRaw(iterator: String, limit: Int): RawBatch = {
    val Array(stream, shardId, afterStr) = iterator.split('|')
    val after = afterStr.toLong
    val res = inner.getRecords(stream, shardId, after, limit)
    val raw = res.records.map(r =>
      RawRecord(toOpaque(r.sequenceNumber), r.partitionKey, r.data, r.arrivalMicros))
    val lastSeq = res.records.lastOption.map(_.sequenceNumber).getOrElse(after)
    val closed = inner.describeShards(stream)
      .find(_.shardId == shardId).flatMap(_.endingSequence)
    val drained = closed.exists(end => lastSeq >= end && res.records.size < limit)
    RawBatch(raw,
      nextIterator = if (drained) None else Some(s"$stream|$shardId|$lastSeq"),
      millisBehindLatest = res.millisBehindLatest)
  }

  override def putRecordsRaw(stream: String,
      records: Seq[KinesisApi.PutEntry]): Seq[RetryingBatchWriter.Outcome] =
    inner.putRecords(stream, records)
}
