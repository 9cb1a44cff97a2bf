package software.amazon.awssdk.services.sqs.model;

public final class ReceiptHandleIsInvalidException extends RuntimeException {
  private ReceiptHandleIsInvalidException() {}
}
