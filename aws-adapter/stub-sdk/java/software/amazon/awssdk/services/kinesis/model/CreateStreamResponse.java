package software.amazon.awssdk.services.kinesis.model;

public final class CreateStreamResponse {
  private CreateStreamResponse() {}
}
