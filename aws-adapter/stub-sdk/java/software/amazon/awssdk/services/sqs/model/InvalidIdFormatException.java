package software.amazon.awssdk.services.sqs.model;

public final class InvalidIdFormatException extends RuntimeException {
  private InvalidIdFormatException() {}
}
