package software.amazon.awssdk.services.sqs.model;

public final class CreateQueueResponse {
  private CreateQueueResponse() {}
  public String queueUrl() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
