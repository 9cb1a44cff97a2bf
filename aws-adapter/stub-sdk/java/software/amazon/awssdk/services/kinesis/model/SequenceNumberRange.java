package software.amazon.awssdk.services.kinesis.model;

public final class SequenceNumberRange {
  private SequenceNumberRange() {}
  public String startingSequenceNumber() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String endingSequenceNumber() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
