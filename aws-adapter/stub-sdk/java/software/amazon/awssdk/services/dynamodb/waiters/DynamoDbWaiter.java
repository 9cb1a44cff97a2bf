package software.amazon.awssdk.services.dynamodb.waiters;

import java.util.function.Consumer;
import software.amazon.awssdk.core.waiters.WaiterResponse;
import software.amazon.awssdk.services.dynamodb.model.DescribeTableRequest;
import software.amazon.awssdk.services.dynamodb.model.DescribeTableResponse;

public interface DynamoDbWaiter {
  WaiterResponse<DescribeTableResponse> waitUntilTableExists(
      Consumer<DescribeTableRequest.Builder> request);
}
