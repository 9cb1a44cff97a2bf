// COMPILE-ONLY SIGNATURE STUB of the aws-sdk-java-v2 public surface used
// by graft.aws (transcribed from the published v2.25.x API docs). Never
// a runtime artifact: every body throws. See aws-adapter/stub-sdk/README.md.
package software.amazon.awssdk.core;

public final class SdkBytes {
  private SdkBytes() {}
  public static SdkBytes fromUtf8String(String s) { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String asUtf8String() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
