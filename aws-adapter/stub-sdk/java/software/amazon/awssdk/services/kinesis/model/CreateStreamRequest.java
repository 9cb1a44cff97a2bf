package software.amazon.awssdk.services.kinesis.model;

public final class CreateStreamRequest {
  private CreateStreamRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder streamName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder shardCount(Integer v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public CreateStreamRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
