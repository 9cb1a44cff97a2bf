package graft.sources

/** Distributed shard-lease election for multi-worker stream consumption —
  * the algorithm a fleet of readers uses to divide N shards among
  * themselves with no coordinator, only a shared control table with
  * conditional writes (DynamoDB-style compare-and-set).
  *
  * Re-expresses the reference's Kinesis shard election
  * (`/root/reference/motorway/contrib/amazon_kinesis/ramps.py:81-184`):
  *   - '''claim''': read the record, rewrite it with our worker id and a
  *     reset heartbeat, conditionally on the checkpoint being unchanged
  *     since the read (`ramps.py:81-103`). The checkpoint itself is
  *     carried over — that is how a takeover resumes exactly where the
  *     dead worker stopped ("checkpoint transfer").
  *   - '''staleness detection''': snapshot heartbeats, wait one timeout,
  *     re-read; if neither heartbeat nor owner moved, the owner is dead
  *     and the shard claimable (`ramps.py:117-145`).
  *   - '''rebalance''': with per-worker shard counts and the set of
  *     active workers (those whose heartbeat moved during the wait),
  *     a worker below ⌊shards/activeWorkers⌋ may take a shard from a
  *     worker above it, or any multi-shard worker if it has none
  *     (`ramps.py:147-184`).
  *
  * In this Spark-native engine the *offset* role of the lease table is
  * subsumed by Structured Streaming's checkpointed offset log (see
  * QueueRampProvider), so this coordinator is the piece a multi-worker
  * deployment still needs: deciding WHICH worker pulls which shard.
  * It is pure logic over the [[LeaseTable]] contract — testable offline
  * (ShardLeaseSpec mirrors the reference's election test scenarios) and
  * usable against any CAS-capable store.
  *
  * The wait is injected (`onWait`) so tests advance the table
  * deterministically instead of sleeping, exactly like the reference's
  * patched `time.sleep`.
  */
final case class ShardLease(shardId: String, checkpoint: Long, workerId: String, heartbeat: Long)

/** Absent control record: nobody ever claimed the shard. */
final case class NoLeaseRecord(shardId: String)
  extends RuntimeException(s"no lease record for shard $shardId")

/** DynamoDB-shaped control-table contract: point read, scan, insert-if-
  * absent, and conditional replace (the CAS that makes claims atomic). */
trait LeaseTable {
  def get(shardId: String): Option[ShardLease]
  def scan(): Seq[ShardLease]
  /** First claim of a never-seen shard; false if a record exists. */
  def putIfAbsent(lease: ShardLease): Boolean
  /** Replace the record for `lease.shardId` iff the stored record still
    * satisfies `cond` — models a DynamoDB ConditionExpression put.
    * False (not an exception) on condition failure. */
  def putIf(lease: ShardLease)(cond: ShardLease => Boolean): Boolean
}

/** Thread-safe in-memory [[LeaseTable]] — the test double (the reference
  * tests use the same shape, `tests/test_amazon_kinesis.py:15-32`) and a
  * correct single-JVM implementation. */
final class InMemoryLeaseTable extends LeaseTable {
  private val records = scala.collection.mutable.LinkedHashMap[String, ShardLease]()
  def get(shardId: String): Option[ShardLease] = synchronized(records.get(shardId))
  def scan(): Seq[ShardLease] = synchronized(records.values.toVector)
  def putIfAbsent(lease: ShardLease): Boolean = synchronized {
    if (records.contains(lease.shardId)) false
    else { records(lease.shardId) = lease; true }
  }
  def putIf(lease: ShardLease)(cond: ShardLease => Boolean): Boolean = synchronized {
    records.get(lease.shardId) match {
      case Some(old) if cond(old) => records(lease.shardId) = lease; true
      case _ => false
    }
  }
  /** Test hook: unconditional mutation (simulates another process). */
  def force(lease: ShardLease): Unit = synchronized { records(lease.shardId) = lease }
}

final class ShardLeaseCoordinator(
    val workerId: String,
    table: LeaseTable,
    onWait: () => Unit = () => ()) {

  /** Atomically take over a shard: keep its checkpoint (re-read at claim
    * time — the takeover resumes from wherever the previous owner
    * checkpointed last), reset the heartbeat, CAS on the checkpoint
    * being unchanged between our read and write. */
  def claimShard(shardId: String): Boolean = {
    val rec = table.get(shardId).getOrElse(throw NoLeaseRecord(shardId))
    table.putIf(rec.copy(workerId = workerId, heartbeat = 0L)) { old =>
      old.checkpoint == rec.checkpoint
    }
  }

  /** Register a never-claimed shard as ours (checkpoint 0). */
  def claimNewShard(shardId: String): Boolean =
    table.putIfAbsent(ShardLease(shardId, checkpoint = 0L, workerId, heartbeat = 0L))

  /** Owner's periodic heartbeat + checkpoint publish; false means the
    * record moved under us (typically: we lost the shard). */
  def heartbeat(shardId: String, newCheckpoint: Long): Boolean = {
    val rec = table.get(shardId).getOrElse(throw NoLeaseRecord(shardId))
    if (rec.workerId != workerId) return false
    table.putIf(rec.copy(heartbeat = rec.heartbeat + 1, checkpoint = newCheckpoint)) { old =>
      old.checkpoint == rec.checkpoint && old.workerId == rec.workerId &&
        old.heartbeat == rec.heartbeat
    }
  }

  /** Should this worker take `shardId`? True when the current owner went
    * stale during the wait, or when taking it improves balance. */
  def canClaimShard(shardId: String): Boolean = {
    val snapshot = table.scan()
    val rec = snapshot.find(_.shardId == shardId).getOrElse(throw NoLeaseRecord(shardId))
    // Heartbeats per worker as of the snapshot (last record wins, like
    // the reference's scan loop); our own entry pinned so a worker that
    // is us never looks "active" merely by existing.
    var heartbeats = Map.empty[String, Long]
    snapshot.foreach(l => heartbeats += l.workerId -> l.heartbeat)
    heartbeats += workerId -> 0L

    onWait()

    val updated = table.get(shardId).getOrElse(throw NoLeaseRecord(shardId))
    if (updated.heartbeat == rec.heartbeat && updated.workerId == rec.workerId)
      return true // owner made no progress for a full timeout: stale

    // Balance pass over a fresh scan: a worker is active iff its
    // heartbeat moved during the wait (self is active by definition,
    // unless it owns shards whose heartbeats it failed to move —
    // matching the reference's overwrite order).
    val current = table.scan()
    var active = Map(workerId -> true)
    current.foreach { l =>
      active += l.workerId -> !heartbeats.get(l.workerId).contains(l.heartbeat)
    }
    val nActive = math.max(1, active.valuesIterator.count(identity))
    val optimal = current.size / nActive
    val perWorker = current.groupBy(_.workerId).map { case (w, ls) => w -> ls.size }
    val mine = perWorker.getOrElse(workerId, 0)
    current.exists { l =>
      l.shardId == shardId && {
        val owners = perWorker.getOrElse(l.workerId, 0)
        (owners > optimal || (mine == 0 && owners > 1)) && mine < optimal
      }
    }
  }
}
