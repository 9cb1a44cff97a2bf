package software.amazon.awssdk.services.kinesis.model;

public final class ListShardsRequest {
  private ListShardsRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder streamName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder nextToken(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public ListShardsRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
