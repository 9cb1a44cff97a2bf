package software.amazon.awssdk.services.kinesis.model;

import java.util.List;

public final class PutRecordsResponse {
  private PutRecordsResponse() {}
  public List<PutRecordsResultEntry> records() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
