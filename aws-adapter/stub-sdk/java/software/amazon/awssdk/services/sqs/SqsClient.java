// COMPILE-ONLY SIGNATURE STUB — see aws-adapter/stub-sdk/README.md.
package software.amazon.awssdk.services.sqs;

import software.amazon.awssdk.services.sqs.model.*;

public interface SqsClient {
  static SqsClient create() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  GetQueueUrlResponse getQueueUrl(GetQueueUrlRequest request);
  CreateQueueResponse createQueue(CreateQueueRequest request);
  ReceiveMessageResponse receiveMessage(ReceiveMessageRequest request);
  DeleteMessageResponse deleteMessage(DeleteMessageRequest request);
  SendMessageResponse sendMessage(SendMessageRequest request);
}
