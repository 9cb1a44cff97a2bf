package software.amazon.awssdk.services.sqs.model;

public final class DeleteMessageRequest {
  private DeleteMessageRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder queueUrl(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder receiptHandle(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public DeleteMessageRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
