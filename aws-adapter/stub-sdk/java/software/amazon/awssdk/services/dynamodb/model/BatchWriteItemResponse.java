package software.amazon.awssdk.services.dynamodb.model;

import java.util.List;
import java.util.Map;

public final class BatchWriteItemResponse {
  private BatchWriteItemResponse() {}
  public Map<String, List<WriteRequest>> unprocessedItems() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
