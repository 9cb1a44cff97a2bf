package software.amazon.awssdk.services.dynamodb.model;

public final class DescribeTableRequest {
  private DescribeTableRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder tableName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public DescribeTableRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
