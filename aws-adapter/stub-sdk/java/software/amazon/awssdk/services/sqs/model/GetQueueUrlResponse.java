package software.amazon.awssdk.services.sqs.model;

public final class GetQueueUrlResponse {
  private GetQueueUrlResponse() {}
  public String queueUrl() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
