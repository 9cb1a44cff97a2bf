package software.amazon.awssdk.services.dynamodb.model;

public final class AttributeDefinition {
  private AttributeDefinition() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder attributeName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder attributeType(ScalarAttributeType v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public AttributeDefinition build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
