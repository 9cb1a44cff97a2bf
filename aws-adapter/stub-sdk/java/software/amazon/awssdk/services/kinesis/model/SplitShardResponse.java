package software.amazon.awssdk.services.kinesis.model;

public final class SplitShardResponse {
  private SplitShardResponse() {}
}
