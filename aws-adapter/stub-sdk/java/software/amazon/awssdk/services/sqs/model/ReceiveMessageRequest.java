package software.amazon.awssdk.services.sqs.model;

public final class ReceiveMessageRequest {
  private ReceiveMessageRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder queueUrl(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder maxNumberOfMessages(Integer v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder visibilityTimeout(Integer v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder waitTimeSeconds(Integer v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public ReceiveMessageRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
