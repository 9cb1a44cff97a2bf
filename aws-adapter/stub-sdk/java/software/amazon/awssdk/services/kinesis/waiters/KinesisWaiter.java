package software.amazon.awssdk.services.kinesis.waiters;

import java.util.function.Consumer;
import software.amazon.awssdk.core.waiters.WaiterResponse;
import software.amazon.awssdk.services.kinesis.model.DescribeStreamRequest;
import software.amazon.awssdk.services.kinesis.model.DescribeStreamResponse;

public interface KinesisWaiter {
  WaiterResponse<DescribeStreamResponse> waitUntilStreamExists(
      Consumer<DescribeStreamRequest.Builder> request);
}
