package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka ramp/sink passthrough — the reference's Kafka connector
  * (`contrib/kafka/ramps.py:17-235`, `contrib/kafka/intersections.py:
  * 15-91`) collapses to configuration over Spark's built-in kafka
  * source: broker-managed groups, offset tracking, and backpressure are
  * native. These builders pin the reference's operational constants to
  * their Spark equivalents:
  *
  *  - per-partition/global uncompleted throttles (3,000 / 10,000,
  *    `ramps.py:30-33`) → `maxOffsetsPerTrigger` admission control;
  *  - commit-oldest-uncompleted (`ramps.py:180-198`) → checkpointed
  *    offsets committed per micro-batch (strictly stronger: no
  *    re-delivery of completed offsets after clean restart);
  *  - message id `"{partition}-{offset}"` (`ramps.py:140-143`) →
  *    derived `id` column;
  *  - key → `groupingValue` (HashRing routing parity).
  *
  * Untestable without a broker in this environment; the option maps and
  * the message-envelope projection are unit-tested, and the projection
  * is exercised against synthetic kafka-shaped rows.
  */
object KafkaRamp {
  val DefaultMaxOffsetsPerTrigger = 10000L // ≙ global uncompleted bound

  def readOptions(
      bootstrapServers: String, topics: Seq[String],
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Long = DefaultMaxOffsetsPerTrigger): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topics.mkString(","),
    "startingOffsets" -> startingOffsets,
    "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString,
    "failOnDataLoss" -> "false")

  def stream(spark: SparkSession, bootstrapServers: String, topics: Seq[String]): DataFrame =
    toMessageEnvelope(
      readOptions(bootstrapServers, topics).foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }.load())

  /** Kafka wire schema → engine Message envelope (FIXTURES.md §4). */
  def toMessageEnvelope(kafka: DataFrame): DataFrame =
    kafka.select(
      concat_ws("-", col("partition"), col("offset")).as("id"),
      col("value").cast("string").as("content"),
      col("key").cast("string").as("groupingValue"),
      col("timestamp").as("eventTime"))
}

/** Kafka sink passthrough (`contrib/kafka/intersections.py:15-91`):
  * idempotent producer + delivery guarantees are the built-in sink's
  * defaults; the 1 MB size guard (`contrib/kafka/utils.py:8`) becomes a
  * filterable predicate so oversized payloads dead-letter instead of
  * failing the batch. */
object KafkaSink {
  val MaxMessageBytes = 1000000 // ≙ KAFKA_MESSAGE_MAXIMUM_SIZE

  def writeOptions(bootstrapServers: String, topic: String,
      checkpointDir: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "topic" -> topic,
    "checkpointLocation" -> checkpointDir)

  /** Project an envelope stream to the kafka writer shape, splitting
    * off oversized payloads (caller routes them to a dead-letter sink). */
  def partitionBySize(envelope: DataFrame): (DataFrame, DataFrame) = {
    val shaped = envelope.select(
      col("groupingValue").cast("string").as("key"),
      col("content").cast("string").as("value"))
    (shaped.where(length(col("value")) <= MaxMessageBytes),
     shaped.where(length(col("value")) > MaxMessageBytes))
  }
}
