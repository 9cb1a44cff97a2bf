package software.amazon.awssdk.services.kinesis.model;

public final class DescribeStreamResponse {
  private DescribeStreamResponse() {}
}
