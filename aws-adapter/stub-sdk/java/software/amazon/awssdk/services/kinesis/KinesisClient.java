// COMPILE-ONLY SIGNATURE STUB — see aws-adapter/stub-sdk/README.md.
package software.amazon.awssdk.services.kinesis;

import java.util.function.Consumer;
import software.amazon.awssdk.services.kinesis.model.*;
import software.amazon.awssdk.services.kinesis.waiters.KinesisWaiter;

public interface KinesisClient {
  static KinesisClient create() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  ListShardsResponse listShards(ListShardsRequest request);
  ListShardsResponse listShards(Consumer<ListShardsRequest.Builder> request);
  GetShardIteratorResponse getShardIterator(GetShardIteratorRequest request);
  GetRecordsResponse getRecords(GetRecordsRequest request);
  PutRecordsResponse putRecords(PutRecordsRequest request);
  CreateStreamResponse createStream(CreateStreamRequest request);
  SplitShardResponse splitShard(SplitShardRequest request);
  KinesisWaiter waiter();
}
