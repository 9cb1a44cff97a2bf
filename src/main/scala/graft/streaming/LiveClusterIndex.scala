package graft.streaming

import org.apache.spark.sql.DataFrame

/** The dedup cluster index kept live by the pipeline — the streaming
  * face of q158's incremental connected components: candidate duplicate
  * PAIRS arrive in micro-batches (from the streaming near-dup stage),
  * and each batch folds into a min-root union-find, so "which cluster
  * is this doc in" is answerable between batches without ever
  * re-clustering the corpus.
  *
  * Min-root discipline: union always attaches the LARGER root beneath
  * the smaller, so every component's representative is its minimum
  * member id — exactly the label `ConnectedComponents.minLabelPropagation`
  * (and therefore q84/q158) assigns. LiveClusterIndexSpec asserts the
  * equality after streaming the full pair log, and batch-replay
  * idempotence (union is idempotent, so at-least-once delivery of a
  * pair batch cannot corrupt the index).
  *
  * Scale posture: this state is NODE-count-bound — the same bound as
  * CC's packed driver fallback (~50 MB at 1M edges, measured in
  * `StressMain ccmem`), because dedup pair sets are result-sized even
  * for huge corpora. Past that bound, the batch path is q158's
  * contraction (delta-sized distributed CC per ingest); this class is
  * the serving-cache tier in front of it, mirroring how the reference
  * keeps operator state in-process ahead of its durable store.
  *
  * The bound is ENFORCED, not advisory: a batch that grows the index
  * past `maxNodes` fails the fold with a loud [[IllegalStateException]]
  * naming the contraction path — which fails the streaming query (the
  * reference's posture: a pipeline whose assumptions break dies
  * visibly, `motorway/pipeline.py:127-135`; the stats listener then
  * shows `failing` with the traceback). Silent unbounded driver growth
  * is the one failure mode a serving cache must never have.
  */
final class LiveClusterIndex(maxNodes: Long = LiveClusterIndex.DefaultMaxNodes) {

  private val parent = scala.collection.mutable.LongMap.empty[Long]

  private def find(x: Long): Long = {
    var r = x
    while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
    // path compression
    var c = x
    while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
    r
  }

  private def union(a: Long, b: Long): Unit = {
    parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
    val ra = find(a); val rb = find(b)
    if (ra != rb) {
      if (ra < rb) parent(rb) = ra else parent(ra) = rb
    }
  }

  /** Fold one micro-batch of (a_id, b_id) pairs into the index. Called
    * from foreachBatch (driver-side, serialized per batch). The collect
    * is bounded by the batch's PAIR count — result-sized for dedup.
    *
    * @throws IllegalStateException when the fold would grow the index
    *         past `maxNodes`. Union is idempotent and the guard fires
    *         before any of THIS batch's pairs are applied, so an
    *         at-least-once retry after raising the bound (or after
    *         migrating to the contraction path) replays cleanly. */
  def merge(pairs: DataFrame): Unit = {
    val batch = pairs.select(pairs.columns.head, pairs.columns(1)).collect()
    val newNodes = {
      val seen = new java.util.HashSet[java.lang.Long]()
      batch.foreach { r => seen.add(r.getLong(0)); seen.add(r.getLong(1)) }
      seen.removeIf(x => parent.contains(x))
      seen.size.toLong
    }
    if (parent.size + newNodes > maxNodes)
      throw new IllegalStateException(
        s"LiveClusterIndex bound exceeded: ${parent.size} nodes + $newNodes new > " +
        s"maxNodes=$maxNodes. This serving cache is node-bound by design — " +
        "move cluster maintenance to the distributed contraction path " +
        "(q158, graft.queries.Curation8 incremental CC) and serve labels " +
        "from its output, or raise maxNodes if driver memory allows.")
    batch.foreach(r => union(r.getLong(0), r.getLong(1)))
  }

  /** Current labels: node → min id of its component (fully compressed). */
  def labels: Map[Long, Long] =
    parent.keys.map(k => k -> find(k)).toMap

  /** Attach to a streaming pair relation: every micro-batch folds in.
    * A bound overflow inside [[merge]] fails this query loudly. */
  def attach(pairs: DataFrame, queryName: String = "live_cluster_index") =
    pairs.writeStream.queryName(queryName)
      .foreachBatch((df: DataFrame, _: Long) => merge(df))
      .start()
}

object LiveClusterIndex {
  /** Default node bound: 4M entries ≈ 2 LongMap slots + compressed-root
    * churn ≈ low-hundreds of MB on the driver — the same envelope as
    * CC's packed driver fallback cutover (StressMain ccmem). */
  val DefaultMaxNodes: Long = 4000000L
}
