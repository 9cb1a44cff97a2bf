package software.amazon.awssdk.services.kinesis.model;

import java.time.Instant;
import software.amazon.awssdk.core.SdkBytes;

public final class Record {
  private Record() {}
  public String sequenceNumber() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String partitionKey() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public SdkBytes data() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public Instant approximateArrivalTimestamp() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
