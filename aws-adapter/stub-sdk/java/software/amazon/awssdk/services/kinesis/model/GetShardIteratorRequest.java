package software.amazon.awssdk.services.kinesis.model;

public final class GetShardIteratorRequest {
  private GetShardIteratorRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder streamName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder shardId(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder shardIteratorType(ShardIteratorType v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder startingSequenceNumber(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public GetShardIteratorRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
