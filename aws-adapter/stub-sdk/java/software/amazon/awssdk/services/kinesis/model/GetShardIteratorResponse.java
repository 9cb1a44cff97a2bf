package software.amazon.awssdk.services.kinesis.model;

public final class GetShardIteratorResponse {
  private GetShardIteratorResponse() {}
  public String shardIterator() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
