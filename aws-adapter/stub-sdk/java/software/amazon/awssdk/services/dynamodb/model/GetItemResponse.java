package software.amazon.awssdk.services.dynamodb.model;

import java.util.Map;

public final class GetItemResponse {
  private GetItemResponse() {}
  public boolean hasItem() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public Map<String, AttributeValue> item() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
