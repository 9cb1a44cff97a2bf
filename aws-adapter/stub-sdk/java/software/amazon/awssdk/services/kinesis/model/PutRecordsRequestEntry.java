package software.amazon.awssdk.services.kinesis.model;

import software.amazon.awssdk.core.SdkBytes;

public final class PutRecordsRequestEntry {
  private PutRecordsRequestEntry() {}
  public static Builder builder() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public static final class Builder {
    private Builder() {}
    public Builder partitionKey(String v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public Builder data(SdkBytes v) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
    public PutRecordsRequestEntry build() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  }
}
