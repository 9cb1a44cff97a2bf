package software.amazon.awssdk.services.kinesis.model;

public final class GetRecordsRequest {
  private GetRecordsRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder shardIterator(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder limit(Integer v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public GetRecordsRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
