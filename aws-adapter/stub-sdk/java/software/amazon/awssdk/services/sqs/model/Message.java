package software.amazon.awssdk.services.sqs.model;

public final class Message {
  private Message() {}
  public String messageId() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String receiptHandle() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String body() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
