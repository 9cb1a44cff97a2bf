package software.amazon.awssdk.services.dynamodb.model;

public final class AttributeValue {
  private AttributeValue() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String s() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String n() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder s(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder n(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public AttributeValue build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
