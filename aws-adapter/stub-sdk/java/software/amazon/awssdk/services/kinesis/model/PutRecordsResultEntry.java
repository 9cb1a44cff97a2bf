package software.amazon.awssdk.services.kinesis.model;

public final class PutRecordsResultEntry {
  private PutRecordsResultEntry() {}
  public String errorCode() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String errorMessage() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
