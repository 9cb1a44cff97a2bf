package software.amazon.awssdk.services.dynamodb.model;

import java.util.Map;

public final class PutRequest {
  private PutRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder item(Map<String, AttributeValue> v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public PutRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
