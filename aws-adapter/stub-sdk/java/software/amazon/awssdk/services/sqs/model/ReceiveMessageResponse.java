package software.amazon.awssdk.services.sqs.model;

import java.util.List;

public final class ReceiveMessageResponse {
  private ReceiveMessageResponse() {}
  public List<Message> messages() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
