package software.amazon.awssdk.services.dynamodb.model;

import java.util.Map;

public final class QueryRequest {
  private QueryRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder tableName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder keyConditionExpression(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder expressionAttributeValues(Map<String, AttributeValue> v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder scanIndexForward(Boolean v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder limit(Integer v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder consistentRead(Boolean v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public QueryRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
