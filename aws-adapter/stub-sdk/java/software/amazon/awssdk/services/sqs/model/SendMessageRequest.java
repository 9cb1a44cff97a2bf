package software.amazon.awssdk.services.sqs.model;

public final class SendMessageRequest {
  private SendMessageRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder queueUrl(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder messageBody(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public SendMessageRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
