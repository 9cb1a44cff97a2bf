package software.amazon.awssdk.services.kinesis.model;

import java.util.List;

public final class GetRecordsResponse {
  private GetRecordsResponse() {}
  public List<Record> records() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String nextShardIterator() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public Long millisBehindLatest() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
