package software.amazon.awssdk.core.waiters;

public interface WaiterResponse<T> {
}
