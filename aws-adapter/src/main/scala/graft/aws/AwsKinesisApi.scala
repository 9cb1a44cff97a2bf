package graft.aws

import scala.jdk.CollectionConverters._

import software.amazon.awssdk.core.SdkBytes
import software.amazon.awssdk.services.dynamodb.DynamoDbClient
import software.amazon.awssdk.services.dynamodb.model.{AttributeValue, BatchWriteItemRequest, GetItemRequest, PutRequest, WriteRequest}
import software.amazon.awssdk.services.kinesis.KinesisClient
import software.amazon.awssdk.services.kinesis.model._

import graft.sinks.RetryingBatchWriter
import graft.sources.KinesisApi

/** Durable ordinal↔AWS-sequence bridge for [[AwsKinesisApi]].
  *
  * The seam speaks per-shard monotone `Long` sequence numbers (the
  * consumer checkpoints min-uncompleted, compares, and resumes from
  * them); AWS Kinesis sequence numbers are ~186-bit opaque decimal
  * strings. The bridge persists, per consumed record, the pair
  * (ordinal → AWS sequence string) so a resume from ANY checkpointed
  * ordinal can be translated back to a
  * GetShardIterator(AFTER_SEQUENCE_NUMBER) call — including a takeover
  * by a different worker, which reads the same table.
  *
  * Write amplification is bounded by design: entries are only needed
  * for the UNCOMPLETED window, which admission control already caps at
  * 3,000 records/shard (the reference's MAX_UNCOMPLETED_ITEMS,
  * `ramps.py:25`); each batch of consumed records is one
  * BatchWriteItem per 25 (the DynamoDB cap), and an `expires_at` TTL
  * attribute lets DynamoDB reap entries far behind every checkpoint.
  * This is the same per-record durability class as a KCL
  * checkpoint-capable consumer.
  *
  * Item layout: pk = "stream/shardId", sk = ordinal (N), seq (S),
  * expires_at (N, epoch seconds). The shard-end marker uses sk = -1
  * with the final ordinal in `end_ordinal` — written when a consumer
  * observes the closed shard's last record, which is exactly when the
  * drain gate ([[graft.sources.KinesisResharding]]) starts needing it.
  */
final class DynamoSequenceBridge(client: DynamoDbClient, table: String,
    ttlSeconds: Long = 7 * 24 * 3600) {

  private def pk(stream: String, shardId: String) =
    AttributeValue.builder().s(s"$stream/$shardId").build()
  private def n(v: Long) = AttributeValue.builder().n(v.toString).build()

  /** Persist consumed (ordinal, awsSequence) pairs — 25/BatchWriteItem. */
  def record(stream: String, shardId: String, pairs: Seq[(Long, String)]): Unit = {
    val now = System.currentTimeMillis() / 1000
    pairs.grouped(25).foreach { chunk =>
      val writes = chunk.map { case (ord, seq) =>
        WriteRequest.builder().putRequest(PutRequest.builder().item(Map(
          "pk" -> pk(stream, shardId),
          "sk" -> n(ord),
          "seq" -> AttributeValue.builder().s(seq).build(),
          "expires_at" -> n(now + ttlSeconds),
        ).asJava).build()).build()
      }.asJava
      // unprocessed items retry: BatchWriteItem is not atomic
      var req = BatchWriteItemRequest.builder()
        .requestItems(Map(table -> writes).asJava).build()
      var res = client.batchWriteItem(req)
      while (!res.unprocessedItems().isEmpty) {
        req = BatchWriteItemRequest.builder()
          .requestItems(res.unprocessedItems()).build()
        res = client.batchWriteItem(req)
      }
    }
  }

  /** AWS sequence string checkpointed under `ordinal`, if still live. */
  def sequenceOf(stream: String, shardId: String, ordinal: Long): Option[String] = {
    val res = client.getItem(GetItemRequest.builder().tableName(table)
      .key(Map("pk" -> pk(stream, shardId), "sk" -> n(ordinal)).asJava)
      .consistentRead(true).build())
    if (res.hasItem && !res.item().isEmpty) Some(res.item().get("seq").s()) else None
  }

  def markEnd(stream: String, shardId: String, endOrdinal: Long): Unit =
    client.putItem(software.amazon.awssdk.services.dynamodb.model.PutItemRequest.builder()
      .tableName(table)
      .item(Map(
        "pk" -> pk(stream, shardId), "sk" -> n(-1L),
        "end_ordinal" -> n(endOrdinal)).asJava)
      .build())

  def endOf(stream: String, shardId: String): Option[Long] = {
    val res = client.getItem(GetItemRequest.builder().tableName(table)
      .key(Map("pk" -> pk(stream, shardId), "sk" -> n(-1L)).asJava)
      .consistentRead(true).build())
    if (res.hasItem && !res.item().isEmpty)
      Some(res.item().get("end_ordinal").n().toLong)
    else None
  }

  /** Highest persisted ordinal (resume point for a fresh consumer that
    * wants the tail) — a 1-item descending Query on the partition. */
  def lastOrdinal(stream: String, shardId: String): Option[Long] = {
    val res = client.query(
      software.amazon.awssdk.services.dynamodb.model.QueryRequest.builder()
        .tableName(table)
        .keyConditionExpression("pk = :p AND sk >= :z")
        .expressionAttributeValues(Map(
          ":p" -> pk(stream, shardId), ":z" -> n(0L)).asJava)
        .scanIndexForward(false).limit(1).consistentRead(true).build())
    res.items().asScala.headOption.map(_.get("sk").n().toLong)
  }
}

/** aws-sdk-v2 binding for the [[graft.sources.KinesisApi]] seam — the
  * method mapping pinned by ApiConformanceSpec's scaladoc, implementing
  * the reference's Kinesis surface (`contrib/amazon_kinesis/ramps.py:
  * 186-315`, `intersections.py:10-69`):
  *
  *  - listShards/describeShards ← ListShards (paginated; ParentShardId
  *    + AdjacentParentShardId → parents, SequenceNumberRange
  *    .EndingSequenceNumber → closed marker)
  *  - getRecords ← GetShardIterator(TRIM_HORIZON |
  *    AFTER_SEQUENCE_NUMBER via the bridge) + GetRecords(Limit);
  *    MillisBehindLatest is passed through as the lag gauge
  *    (≙ `ramps.py:290-298`)
  *  - putRecords ← PutRecords; per-record ErrorCode maps to the
  *    reference's retry set (`intersections.py:45-67`):
  *    ProvisionedThroughputExceededException / InternalFailure →
  *    Retryable, anything else → Hard, success → Ok, request order
  *    preserved
  *
  * Sequence-number width: see [[DynamoSequenceBridge]]. A closed
  * shard's `endingSequence` is reported as the bridge's observed end
  * ordinal once a consumer has drained to it, and `Long.MaxValue`
  * before that — the resharding drain gate (children claimable only
  * after the parent checkpoints its end) composes correctly with
  * either value, because the gate compares the lease checkpoint
  * against it and an undrained parent can never have checkpointed
  * `Long.MaxValue`.
  */
final class AwsKinesisApi(kinesis: KinesisClient, bridge: DynamoSequenceBridge)
    extends KinesisApi {

  private def shardPages(stream: String): Seq[Shard] = {
    val out = Vector.newBuilder[Shard]
    var token: String = null
    var first = true
    while (first || token != null) {
      val b = ListShardsRequest.builder()
      if (token != null) b.nextToken(token) else b.streamName(stream)
      val res = kinesis.listShards(b.build())
      out ++= res.shards().asScala
      token = res.nextToken()
      first = false
    }
    out.result()
  }

  override def listShards(stream: String): Seq[String] =
    shardPages(stream).map(_.shardId())

  override def describeShards(stream: String): Seq[KinesisApi.ShardInfo] =
    shardPages(stream).map { s =>
      val closed = Option(s.sequenceNumberRange()).exists(_.endingSequenceNumber() != null)
      KinesisApi.ShardInfo(
        shardId = s.shardId(),
        parents = (Option(s.parentShardId()) ++ Option(s.adjacentParentShardId())).toSeq,
        endingSequence =
          if (!closed) None
          else Some(bridge.endOf(stream, s.shardId()).getOrElse(Long.MaxValue)))
    }

  override def getRecords(stream: String, shardId: String, afterSequence: Long,
      limit: Int): KinesisApi.GetRecordsResult = {
    val itReq = GetShardIteratorRequest.builder()
      .streamName(stream).shardId(shardId)
    val iterator =
      if (afterSequence <= 0L)
        kinesis.getShardIterator(
          itReq.shardIteratorType(ShardIteratorType.TRIM_HORIZON).build())
          .shardIterator()
      else {
        val awsSeq = bridge.sequenceOf(stream, shardId, afterSequence).getOrElse(
          throw new IllegalStateException(
            s"no bridge entry for $stream/$shardId ordinal $afterSequence — " +
            "the engine only resumes from published checkpoints, whose " +
            "bridge entries outlive them (TTL >> checkpoint lifetime)"))
        kinesis.getShardIterator(
          itReq.shardIteratorType(ShardIteratorType.AFTER_SEQUENCE_NUMBER)
            .startingSequenceNumber(awsSeq).build())
          .shardIterator()
      }
    val res = kinesis.getRecords(
      GetRecordsRequest.builder().shardIterator(iterator)
        .limit(math.min(limit, 1000)) // GET_RECORDS_LIMIT (ramps.py:26)
        .build())
    val recs = res.records().asScala.toVector.zipWithIndex.map { case (r, i) =>
      KinesisApi.Record(
        sequenceNumber = afterSequence + 1 + i,
        partitionKey = r.partitionKey(),
        data = r.data().asUtf8String(),
        arrivalMicros = r.approximateArrivalTimestamp().toEpochMilli * 1000L)
    }
    if (recs.nonEmpty)
      bridge.record(stream, shardId,
        recs.map(_.sequenceNumber).zip(res.records().asScala.map(_.sequenceNumber())))
    // a closed shard is drained when the iterator ends (null next):
    // record its final ordinal so describeShards can report the end
    if (res.nextShardIterator() == null)
      bridge.markEnd(stream, shardId, afterSequence + recs.size)
    KinesisApi.GetRecordsResult(recs,
      millisBehindLatest = Option(res.millisBehindLatest()).map(_.toLong).getOrElse(0L))
  }

  override def putRecords(stream: String,
      records: Seq[KinesisApi.PutEntry]): Seq[RetryingBatchWriter.Outcome] = {
    if (records.isEmpty) return Seq.empty
    val res = kinesis.putRecords(PutRecordsRequest.builder()
      .streamName(stream)
      .records(records.map(e => PutRecordsRequestEntry.builder()
        .partitionKey(e.partitionKey)
        .data(SdkBytes.fromUtf8String(e.data)).build()).asJava)
      .build())
    res.records().asScala.toVector.map { r =>
      r.errorCode() match {
        case null => RetryingBatchWriter.Ok
        // the reference's retryable set (intersections.py:45-67)
        case "ProvisionedThroughputExceededException" | "InternalFailure" =>
          RetryingBatchWriter.Retryable
        case other => RetryingBatchWriter.Hard(s"$other: ${r.errorMessage()}")
      }
    }
  }
}
