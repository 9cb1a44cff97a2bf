package graft.aws

import scala.jdk.CollectionConverters._

import software.amazon.awssdk.services.dynamodb.DynamoDbClient
import software.amazon.awssdk.services.dynamodb.model.{AttributeDefinition, BillingMode, CreateTableRequest, KeySchemaElement, KeyType, ScalarAttributeType}
import software.amazon.awssdk.services.kinesis.KinesisClient
import software.amazon.awssdk.services.kinesis.model.{CreateStreamRequest, DescribeStreamSummaryRequest, SplitShardRequest}
import software.amazon.awssdk.services.sqs.SqsClient

import graft.sources.{KinesisApiConformance, KinesisConformanceFixture, LeaseTable, LeaseTableConformance, SqsApiConformance, SqsConformanceFixture}

/** Live-service instantiation of the seam-conformance kit
  * (`src/test/scala/graft/sources/ApiConformanceSpec.scala`) over the
  * aws-sdk-v2 adapters. Gated on GRAFT_AWS_E2E=1 — without it every
  * test no-ops with an info line, so a credential-less CI stays green.
  *
  * The fixtures create uniquely-named disposable resources (stream,
  * queue, two DynamoDB tables) per run; they are NOT torn down on
  * assertion failure so a failed run can be inspected — reap by the
  * `graft-e2e-` name prefix.
  */
object AwsE2E {
  def enabled: Boolean = sys.env.get("GRAFT_AWS_E2E").contains("1")
  def runId: String = java.lang.Long.toHexString(System.nanoTime())

  def createLeaseTable(ddb: DynamoDbClient, name: String): Unit = {
    ddb.createTable(CreateTableRequest.builder()
      .tableName(name)
      .billingMode(BillingMode.PAY_PER_REQUEST)
      .attributeDefinitions(AttributeDefinition.builder()
        .attributeName("shard_id").attributeType(ScalarAttributeType.S).build())
      .keySchema(KeySchemaElement.builder()
        .attributeName("shard_id").keyType(KeyType.HASH).build())
      .build())
    ddb.waiter().waitUntilTableExists(b => b.tableName(name))
  }

  def createBridgeTable(ddb: DynamoDbClient, name: String): Unit = {
    ddb.createTable(CreateTableRequest.builder()
      .tableName(name)
      .billingMode(BillingMode.PAY_PER_REQUEST)
      .attributeDefinitions(
        AttributeDefinition.builder()
          .attributeName("pk").attributeType(ScalarAttributeType.S).build(),
        AttributeDefinition.builder()
          .attributeName("sk").attributeType(ScalarAttributeType.N).build())
      .keySchema(
        KeySchemaElement.builder().attributeName("pk").keyType(KeyType.HASH).build(),
        KeySchemaElement.builder().attributeName("sk").keyType(KeyType.RANGE).build())
      .build())
    ddb.waiter().waitUntilTableExists(b => b.tableName(name))
  }
}

class AwsKinesisConformance extends KinesisApiConformance("aws-sdk-v2") {
  override protected def fixture(): Option[KinesisConformanceFixture] =
    if (!AwsE2E.enabled) None
    else Some(new KinesisConformanceFixture {
      private val kinesis = KinesisClient.create()
      private val ddb = DynamoDbClient.create()
      private val id = AwsE2E.runId
      val stream = s"graft-e2e-$id"
      private val bridgeTable = s"graft-e2e-bridge-$id"
      AwsE2E.createBridgeTable(ddb, bridgeTable)
      kinesis.createStream(
        CreateStreamRequest.builder().streamName(stream).shardCount(1).build())
      kinesis.waiter().waitUntilStreamExists(b => b.streamName(stream))
      val api = AwsKinesisApi(kinesis, ddb, bridgeTable)

      override def split(parent: String): (String, String) = {
        // midpoint of the parent's hash-key range — the canonical
        // even split (ramps.py's reshard scenarios assume it)
        val shard = kinesis.listShards(b => b.streamName(stream)).shards().asScala
          .find(_.shardId() == parent).get
        val lo = BigInt(shard.hashKeyRange().startingHashKey())
        val hi = BigInt(shard.hashKeyRange().endingHashKey())
        kinesis.splitShard(SplitShardRequest.builder()
          .streamName(stream).shardToSplit(parent)
          .newStartingHashKey(((lo + hi) / 2).toString).build())
        kinesis.waiter().waitUntilStreamExists(b => b.streamName(stream))
        // poll until the two children appear
        var children = Seq.empty[String]
        val deadline = System.currentTimeMillis() + 60000
        while (children.size != 2 && System.currentTimeMillis() < deadline) {
          children = api.describeShards(stream)
            .filter(_.parents.contains(parent)).map(_.shardId)
          if (children.size != 2) Thread.sleep(1000)
        }
        require(children.size == 2, s"split of $parent yielded $children")
        (children.head, children(1))
      }
      override def exactLag: Boolean = false // AWS reports wall-clock ms
    })
}

class AwsSqsConformance extends SqsApiConformance("aws-sdk-v2") {
  override protected def fixture(): Option[SqsConformanceFixture] =
    if (!AwsE2E.enabled) None
    else Some(new SqsConformanceFixture {
      val api = new AwsSqsApi(SqsClient.create(), longPollWaitSeconds = 1)
      val queue = s"graft-e2e-${AwsE2E.runId}"
      override def advanceClock(ms: Long): Unit = Thread.sleep(ms)
    })
}

class AwsLeaseTableConformance extends LeaseTableConformance("aws-sdk-v2") {
  override protected def fixture(): Option[LeaseTable] =
    if (!AwsE2E.enabled) None
    else {
      val ddb = DynamoDbClient.create()
      val name = s"graft-e2e-lease-${AwsE2E.runId}"
      AwsE2E.createLeaseTable(ddb, name)
      Some(new AwsDynamoLeaseTable(ddb, name))
    }
}
