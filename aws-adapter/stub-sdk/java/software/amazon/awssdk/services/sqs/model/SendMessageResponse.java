package software.amazon.awssdk.services.sqs.model;

public final class SendMessageResponse {
  private SendMessageResponse() {}
}
