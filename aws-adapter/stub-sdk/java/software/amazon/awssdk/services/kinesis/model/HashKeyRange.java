package software.amazon.awssdk.services.kinesis.model;

public final class HashKeyRange {
  private HashKeyRange() {}
  public String startingHashKey() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String endingHashKey() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
