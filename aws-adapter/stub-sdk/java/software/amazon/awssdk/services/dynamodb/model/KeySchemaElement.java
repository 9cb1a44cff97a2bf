package software.amazon.awssdk.services.dynamodb.model;

public final class KeySchemaElement {
  private KeySchemaElement() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder attributeName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder keyType(KeyType v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public KeySchemaElement build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
