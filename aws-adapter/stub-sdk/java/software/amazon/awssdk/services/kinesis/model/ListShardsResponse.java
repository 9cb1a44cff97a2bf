package software.amazon.awssdk.services.kinesis.model;

import java.util.List;

public final class ListShardsResponse {
  private ListShardsResponse() {}
  public List<Shard> shards() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
  public String nextToken() { throw new UnsupportedOperationException("aws-sdk signature stub: compile-only"); }
}
