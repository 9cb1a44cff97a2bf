package graft.aws

import scala.jdk.CollectionConverters._

import software.amazon.awssdk.services.sqs.SqsClient
import software.amazon.awssdk.services.sqs.model._

import graft.sources.SqsApi

/** aws-sdk-v2 binding for the [[graft.sources.SqsApi]] seam — the
  * method mapping pinned by ApiConformanceSpec's scaladoc, implementing
  * the reference's SQS surface (`contrib/amazon_sqs/{ramps,intersections,
  * mixins}.py`):
  *
  *  - ensureQueue ← GetQueueUrl, CreateQueue on QueueDoesNotExist
  *    (≙ init_queue, `mixins.py:6-19`)
  *  - receive     ← ReceiveMessage(MaxNumberOfMessages, VisibilityTimeout)
  *    (≙ receive_messages, `ramps.py:19-20`; the caller picks the
  *    long-poll wait)
  *  - delete      ← DeleteMessage(ReceiptHandle); false on
  *    ReceiptHandleIsInvalid (≙ delete on success, `ramps.py:28-31`)
  *  - send        ← SendMessage, 256 KB bound pre-checked client-side
  *    (≙ `utils.py:4-13`)
  *
  * Queue URLs are resolved once per queue name and cached — SQS queue
  * URLs are stable for the queue's lifetime.
  */
final class AwsSqsApi(client: SqsClient, longPollWaitSeconds: Int = 5) extends SqsApi {

  private val urls = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def urlOf(queue: String): String =
    urls.computeIfAbsent(queue, q =>
      client.getQueueUrl(GetQueueUrlRequest.builder().queueName(q).build()).queueUrl())

  override def ensureQueue(queue: String): Boolean =
    try { urlOf(queue); false }
    catch {
      case _: QueueDoesNotExistException =>
        val url = client.createQueue(
          CreateQueueRequest.builder().queueName(queue).build()).queueUrl()
        urls.put(queue, url)
        true
    }

  override def receive(queue: String, max: Int,
      visibilityTimeoutMs: Long): Seq[SqsApi.ReceivedMessage] = {
    ensureQueue(queue)
    val res = client.receiveMessage(ReceiveMessageRequest.builder()
      .queueUrl(urlOf(queue))
      .maxNumberOfMessages(math.min(max, 10)) // AWS hard cap (ramps.py:19)
      .visibilityTimeout(math.max(1, (visibilityTimeoutMs / 1000).toInt))
      .waitTimeSeconds(longPollWaitSeconds)
      .build())
    res.messages().asScala.toVector.map(m =>
      SqsApi.ReceivedMessage(m.messageId(), m.receiptHandle(), m.body()))
  }

  override def delete(queue: String, receiptHandle: String): Boolean =
    try {
      client.deleteMessage(DeleteMessageRequest.builder()
        .queueUrl(urlOf(queue)).receiptHandle(receiptHandle).build())
      true
    } catch {
      case _: ReceiptHandleIsInvalidException => false
      case _: InvalidIdFormatException        => false
    }

  override def send(queue: String, body: String): Unit = {
    require(body.getBytes("UTF-8").length <= 256 * 1024,
      "SQS message exceeds 256 KB (contrib/amazon_sqs/utils.py:4-13)")
    ensureQueue(queue)
    client.sendMessage(SendMessageRequest.builder()
      .queueUrl(urlOf(queue)).messageBody(body).build())
  }
}
