package software.amazon.awssdk.services.dynamodb.model;

public final class DescribeTableResponse {
  private DescribeTableResponse() {}
}
