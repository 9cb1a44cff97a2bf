package software.amazon.awssdk.services.dynamodb.model;

import java.util.Map;

public final class ScanRequest {
  private ScanRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder tableName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder consistentRead(Boolean v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder exclusiveStartKey(Map<String, AttributeValue> v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public ScanRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
