package graft.aws

import scala.jdk.CollectionConverters._

import software.amazon.awssdk.core.SdkBytes
import software.amazon.awssdk.services.dynamodb.DynamoDbClient
import software.amazon.awssdk.services.dynamodb.model.{AttributeValue, BatchWriteItemRequest, GetItemRequest, PutItemRequest, PutRequest, QueryRequest, WriteRequest}
import software.amazon.awssdk.services.kinesis.KinesisClient
import software.amazon.awssdk.services.kinesis.model._

import graft.sinks.RetryingBatchWriter
import graft.sources.{KinesisApi, OpaqueKinesis, OrdinalBridgedKinesis, SequenceBridgeStore}

/** aws-sdk-v2 binding for the [[graft.sources.KinesisApi]] seam.
  *
  * The HARD part — translating the engine's per-shard Long ordinals to
  * AWS's ~186-bit opaque sequence strings durably, across restarts and
  * worker takeovers — is NOT here: it lives in
  * [[graft.sources.OrdinalBridgedKinesis]], which is conformance-tested
  * offline (OrdinalBridgeSpec + the KinesisApiConformance kit over the
  * opaque-sequence double). This module only binds the two leaf
  * abstractions to the SDK:
  *
  *  - [[AwsOpaqueKinesis]] ← ListShards (paginated; ParentShardId +
  *    AdjacentParentShardId → parents, EndingSequenceNumber → closed),
  *    GetShardIterator(TRIM_HORIZON | AFTER_SEQUENCE_NUMBER),
  *    GetRecords(Limit ≤ 1000 — GET_RECORDS_LIMIT, reference
  *    `contrib/amazon_kinesis/ramps.py:26`), PutRecords with the
  *    reference's per-record retryable set
  *    (`intersections.py:45-67`: ProvisionedThroughputExceeded /
  *    InternalFailure → Retryable, else Hard);
  *  - [[DynamoSequenceBridge]] ← a DynamoDB table storing
  *    (ordinal → sequence) per consumed record. Cost is bounded by the
  *    uncompleted-window admission cap (3,000/shard — the reference's
  *    MAX_UNCOMPLETED_ITEMS, `ramps.py:25`): 25-item BatchWriteItems
  *    per consumed batch, an `expires_at` TTL reaping entries far
  *    behind every checkpoint. Item layout: pk = "stream/shardId",
  *    sk = ordinal (N), seq (S); the shard-end marker is sk = -1 with
  *    `end_ordinal`.
  */
object AwsKinesisApi {
  /** The production [[KinesisApi]]: the offline-tested bridge algorithm
    * over SDK-backed leaves. */
  def apply(kinesis: KinesisClient, dynamo: DynamoDbClient,
      bridgeTable: String): KinesisApi =
    new OrdinalBridgedKinesis(
      new AwsOpaqueKinesis(kinesis),
      new DynamoSequenceBridge(dynamo, bridgeTable))
}

/** SDK binding of [[graft.sources.OpaqueKinesis]]. Iterators are the
  * SDK's own shard-iterator tokens, prefixed with nothing — GetRecords
  * consumes them directly. */
final class AwsOpaqueKinesis(client: KinesisClient) extends OpaqueKinesis {
  import OpaqueKinesis._

  private def shardPages(stream: String): Seq[Shard] = {
    val out = Vector.newBuilder[Shard]
    var token: String = null
    var first = true
    while (first || token != null) {
      val b = ListShardsRequest.builder()
      if (token != null) b.nextToken(token) else b.streamName(stream)
      val res = client.listShards(b.build())
      out ++= res.shards().asScala
      token = res.nextToken()
      first = false
    }
    out.result()
  }

  override def describeRaw(stream: String): Seq[RawShard] =
    shardPages(stream).map { s =>
      RawShard(
        shardId = s.shardId(),
        parents = (Option(s.parentShardId()) ++ Option(s.adjacentParentShardId())).toSeq,
        closed = Option(s.sequenceNumberRange()).exists(_.endingSequenceNumber() != null))
    }

  override def iteratorFor(stream: String, shardId: String,
      afterSequence: Option[String]): String = {
    val b = GetShardIteratorRequest.builder().streamName(stream).shardId(shardId)
    val req = afterSequence match {
      case None => b.shardIteratorType(ShardIteratorType.TRIM_HORIZON)
      case Some(seq) => b.shardIteratorType(ShardIteratorType.AFTER_SEQUENCE_NUMBER)
        .startingSequenceNumber(seq)
    }
    client.getShardIterator(req.build()).shardIterator()
  }

  override def getRecordsRaw(iterator: String, limit: Int): RawBatch = {
    val res = client.getRecords(GetRecordsRequest.builder()
      .shardIterator(iterator)
      .limit(math.min(limit, 1000)) // GET_RECORDS_LIMIT (ramps.py:26)
      .build())
    RawBatch(
      records = res.records().asScala.toVector.map(r => RawRecord(
        sequence = r.sequenceNumber(),
        partitionKey = r.partitionKey(),
        data = r.data().asUtf8String(),
        arrivalMicros = r.approximateArrivalTimestamp().toEpochMilli * 1000L)),
      nextIterator = Option(res.nextShardIterator()),
      millisBehindLatest = Option(res.millisBehindLatest()).map(_.toLong).getOrElse(0L))
  }

  override def putRecordsRaw(stream: String,
      records: Seq[KinesisApi.PutEntry]): Seq[RetryingBatchWriter.Outcome] = {
    if (records.isEmpty) return Seq.empty
    val res = client.putRecords(PutRecordsRequest.builder()
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

/** DynamoDB binding of [[graft.sources.SequenceBridgeStore]] — see the
  * module scaladoc for item layout and cost bounds. */
final class DynamoSequenceBridge(client: DynamoDbClient, table: String,
    ttlSeconds: Long = 7 * 24 * 3600) extends SequenceBridgeStore {

  private def pk(stream: String, shardId: String) =
    AttributeValue.builder().s(s"$stream/$shardId").build()
  private def n(v: Long) = AttributeValue.builder().n(v.toString).build()

  override def record(stream: String, shardId: String, pairs: Seq[(Long, String)]): Unit = {
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
      // BatchWriteItem is not atomic: retry unprocessed items to done
      var res = client.batchWriteItem(BatchWriteItemRequest.builder()
        .requestItems(Map(table -> writes).asJava).build())
      while (!res.unprocessedItems().isEmpty)
        res = client.batchWriteItem(BatchWriteItemRequest.builder()
          .requestItems(res.unprocessedItems()).build())
    }
  }

  override def sequenceOf(stream: String, shardId: String, ordinal: Long): Option[String] = {
    val res = client.getItem(GetItemRequest.builder().tableName(table)
      .key(Map("pk" -> pk(stream, shardId), "sk" -> n(ordinal)).asJava)
      .consistentRead(true).build())
    if (res.hasItem && !res.item().isEmpty) Some(res.item().get("seq").s()) else None
  }

  override def markEnd(stream: String, shardId: String, endOrdinal: Long): Unit =
    client.putItem(PutItemRequest.builder()
      .tableName(table)
      .item(Map(
        "pk" -> pk(stream, shardId), "sk" -> n(-1L),
        "end_ordinal" -> n(endOrdinal)).asJava)
      .build())

  override def endOf(stream: String, shardId: String): Option[Long] = {
    val res = client.getItem(GetItemRequest.builder().tableName(table)
      .key(Map("pk" -> pk(stream, shardId), "sk" -> n(-1L)).asJava)
      .consistentRead(true).build())
    if (res.hasItem && !res.item().isEmpty)
      Some(res.item().get("end_ordinal").n().toLong)
    else None
  }

  /** Highest persisted ordinal — a 1-item descending Query on the
    * partition (observability / ops tooling, not used by the bridge). */
  def lastOrdinal(stream: String, shardId: String): Option[Long] = {
    val res = client.query(QueryRequest.builder()
      .tableName(table)
      .keyConditionExpression("pk = :p AND sk >= :z")
      .expressionAttributeValues(Map(
        ":p" -> pk(stream, shardId), ":z" -> n(0L)).asJava)
      .scanIndexForward(false).limit(1).consistentRead(true).build())
    res.items().asScala.headOption.map(_.get("sk").n().toLong)
  }
}
