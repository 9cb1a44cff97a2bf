// COMPILE-ONLY SIGNATURE STUB — see aws-adapter/stub-sdk/README.md.
package software.amazon.awssdk.services.dynamodb;

import software.amazon.awssdk.services.dynamodb.model.*;
import software.amazon.awssdk.services.dynamodb.waiters.DynamoDbWaiter;

public interface DynamoDbClient {
  static DynamoDbClient create() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  GetItemResponse getItem(GetItemRequest request);
  PutItemResponse putItem(PutItemRequest request);
  BatchWriteItemResponse batchWriteItem(BatchWriteItemRequest request);
  QueryResponse query(QueryRequest request);
  ScanResponse scan(ScanRequest request);
  CreateTableResponse createTable(CreateTableRequest request);
  DynamoDbWaiter waiter();
}
