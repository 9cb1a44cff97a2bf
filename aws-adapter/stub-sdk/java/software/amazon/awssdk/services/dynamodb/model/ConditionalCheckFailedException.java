package software.amazon.awssdk.services.dynamodb.model;

public final class ConditionalCheckFailedException extends RuntimeException {
  private ConditionalCheckFailedException() {}
}
