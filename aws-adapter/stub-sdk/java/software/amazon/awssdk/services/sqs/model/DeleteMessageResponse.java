package software.amazon.awssdk.services.sqs.model;

public final class DeleteMessageResponse {
  private DeleteMessageResponse() {}
}
