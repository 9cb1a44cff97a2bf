package software.amazon.awssdk.services.kinesis.model;

public final class Shard {
  private Shard() {}
  public String shardId() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String parentShardId() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String adjacentParentShardId() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public SequenceNumberRange sequenceNumberRange() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public HashKeyRange hashKeyRange() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
