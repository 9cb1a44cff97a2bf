package software.amazon.awssdk.services.kinesis.model;

import java.util.Collection;

public final class PutRecordsRequest {
  private PutRecordsRequest() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder streamName(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder records(Collection<PutRecordsRequestEntry> v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public PutRecordsRequest build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
