package graft.aws

import scala.jdk.CollectionConverters._

import software.amazon.awssdk.services.dynamodb.DynamoDbClient
import software.amazon.awssdk.services.dynamodb.model._

import graft.sources.{LeaseTable, ShardLease}

/** aws-sdk-v2 binding for the [[graft.sources.LeaseTable]] seam — the
  * DynamoDB control table the reference's shard election keeps
  * (`contrib/amazon_kinesis/ramps.py:81-184`; item layout mirrored from
  * its `shard_id / checkpoint / worker_id / heartbeat` attributes and
  * the conditional writes its claim/steal paths issue).
  *
  * Mapping:
  *  - get         ← GetItem (consistent read — a stale read would let
  *                  two workers both believe a claim succeeded)
  *  - scan        ← Scan (the table is shard-count sized; the reference
  *                  scans it the same way on every rebalance pass)
  *  - putIfAbsent ← PutItem ConditionExpression
  *                  attribute_not_exists(shard_id)
  *  - putIf(cond) ← read-snapshot CAS: consistent GetItem, evaluate
  *                  `cond` on the snapshot, then PutItem conditioned on
  *                  ALL attributes still equal to that snapshot. A
  *                  concurrent change between read and write fails the
  *                  condition → false, exactly the semantics the
  *                  in-memory double gives a losing racer. (DynamoDB
  *                  cannot evaluate an arbitrary Scala predicate
  *                  server-side; equality-to-snapshot is the standard
  *                  optimistic-concurrency encoding and is strictly as
  *                  safe — it can only fail MORE often, never less.)
  */
final class AwsDynamoLeaseTable(client: DynamoDbClient, table: String) extends LeaseTable {

  private def key(shardId: String) =
    Map("shard_id" -> AttributeValue.builder().s(shardId).build()).asJava

  private def item(l: ShardLease) = Map(
    "shard_id" -> AttributeValue.builder().s(l.shardId).build(),
    "checkpoint" -> AttributeValue.builder().n(l.checkpoint.toString).build(),
    "worker_id" -> AttributeValue.builder().s(l.workerId).build(),
    "heartbeat" -> AttributeValue.builder().n(l.heartbeat.toString).build(),
  ).asJava

  private def lease(m: java.util.Map[String, AttributeValue]): ShardLease =
    ShardLease(
      shardId = m.get("shard_id").s(),
      checkpoint = m.get("checkpoint").n().toLong,
      workerId = m.get("worker_id").s(),
      heartbeat = m.get("heartbeat").n().toLong)

  override def get(shardId: String): Option[ShardLease] = {
    val res = client.getItem(GetItemRequest.builder()
      .tableName(table).key(key(shardId)).consistentRead(true).build())
    if (res.hasItem && !res.item().isEmpty) Some(lease(res.item())) else None
  }

  override def scan(): Seq[ShardLease] = {
    val out = Vector.newBuilder[ShardLease]
    var start: java.util.Map[String, AttributeValue] = null
    var more = true
    while (more) {
      val b = ScanRequest.builder().tableName(table).consistentRead(true)
      if (start != null) b.exclusiveStartKey(start)
      val res = client.scan(b.build())
      res.items().asScala.foreach(i => out += lease(i))
      start = if (res.hasLastEvaluatedKey) res.lastEvaluatedKey() else null
      more = start != null
    }
    out.result()
  }

  override def putIfAbsent(l: ShardLease): Boolean =
    try {
      client.putItem(PutItemRequest.builder()
        .tableName(table).item(item(l))
        .conditionExpression("attribute_not_exists(shard_id)")
        .build())
      true
    } catch { case _: ConditionalCheckFailedException => false }

  override def putIf(l: ShardLease)(cond: ShardLease => Boolean): Boolean =
    get(l.shardId) match {
      case Some(old) if cond(old) =>
        try {
          client.putItem(PutItemRequest.builder()
            .tableName(table).item(item(l))
            .conditionExpression(
              "checkpoint = :c AND worker_id = :w AND heartbeat = :h")
            .expressionAttributeValues(Map(
              ":c" -> AttributeValue.builder().n(old.checkpoint.toString).build(),
              ":w" -> AttributeValue.builder().s(old.workerId).build(),
              ":h" -> AttributeValue.builder().n(old.heartbeat.toString).build(),
            ).asJava)
            .build())
          true
        } catch { case _: ConditionalCheckFailedException => false }
      case _ => false
    }
}
