package software.amazon.awssdk.services.dynamodb.model;

import java.util.Collection;
import java.util.Map;

public final class BatchWriteItemRequest {
  private BatchWriteItemRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder requestItems(Map<String, ? extends Collection<WriteRequest>> v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public BatchWriteItemRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
