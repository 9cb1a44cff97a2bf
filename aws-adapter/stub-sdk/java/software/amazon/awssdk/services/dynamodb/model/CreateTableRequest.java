package software.amazon.awssdk.services.dynamodb.model;

public final class CreateTableRequest {
  private CreateTableRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder tableName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder billingMode(BillingMode v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder attributeDefinitions(AttributeDefinition... v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder keySchema(KeySchemaElement... v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public CreateTableRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
