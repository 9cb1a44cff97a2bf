package software.amazon.awssdk.services.dynamodb.model;

public final class WriteRequest {
  private WriteRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder putRequest(PutRequest v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public WriteRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
