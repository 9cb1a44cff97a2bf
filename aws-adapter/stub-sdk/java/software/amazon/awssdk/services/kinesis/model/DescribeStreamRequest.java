package software.amazon.awssdk.services.kinesis.model;

public final class DescribeStreamRequest {
  private DescribeStreamRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder streamName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public DescribeStreamRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
