package software.amazon.awssdk.services.sqs.model;

public final class QueueDoesNotExistException extends RuntimeException {
  private QueueDoesNotExistException() {}
}
