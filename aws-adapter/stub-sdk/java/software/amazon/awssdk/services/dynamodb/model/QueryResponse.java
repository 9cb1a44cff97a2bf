package software.amazon.awssdk.services.dynamodb.model;

import java.util.List;
import java.util.Map;

public final class QueryResponse {
  private QueryResponse() {}
  public List<Map<String, AttributeValue>> items() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
