package software.amazon.awssdk.services.dynamodb.model;

import java.util.List;
import java.util.Map;

public final class ScanResponse {
  private ScanResponse() {}
  public List<Map<String, AttributeValue>> items() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public boolean hasLastEvaluatedKey() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public Map<String, AttributeValue> lastEvaluatedKey() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
