package software.amazon.awssdk.services.dynamodb.model;

import java.util.Map;

public final class PutItemRequest {
  private PutItemRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder tableName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder item(Map<String, AttributeValue> v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder conditionExpression(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder expressionAttributeValues(Map<String, AttributeValue> v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public PutItemRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
