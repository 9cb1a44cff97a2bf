package software.amazon.awssdk.services.kinesis.model;

public final class SplitShardRequest {
  private SplitShardRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder streamName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder shardToSplit(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder newStartingHashKey(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public SplitShardRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
