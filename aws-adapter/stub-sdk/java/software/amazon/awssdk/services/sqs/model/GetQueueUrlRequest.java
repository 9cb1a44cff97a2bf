package software.amazon.awssdk.services.sqs.model;

public final class GetQueueUrlRequest {
  private GetQueueUrlRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder queueName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public GetQueueUrlRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
