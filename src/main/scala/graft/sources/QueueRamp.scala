package graft.sources

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer

/** Driver-side message queues backing [[QueueRampProvider]] — the Ramp
  * contract of the reference (`motorway/ramp.py:15-170`):
  * `next()` ≙ [[enqueue]] feeding uncommitted messages,
  * `success(_id)` ≙ the engine calling `MicroBatchStream.commit()` after
  * the batch's sink write succeeds (which is exactly where the Kafka
  * ramp commits the oldest uncompleted offset,
  * `contrib/kafka/ramps.py:180-198`, and the SQS ramp deletes messages,
  * `contrib/amazon_sqs/ramps.py:28-31`).
  *
  * Local/test transport: a process-global registry (valid in local[*];
  * a production source would read the external system from the executor
  * side — this class is the harness proving the offset/commit plumbing).
  */
object QueueRamp {
  final case class Entry(id: String, content: String, groupingValue: String, eventTimeMicros: Long)

  private final class Q {
    val entries = new ArrayBuffer[Entry]()
    val acked = new ArrayBuffer[Entry]()
    var committed: Long = 0L
    var draining: Boolean = false // see markDrainable
  }

  private val queues = new ConcurrentHashMap[String, Q]()

  private def q(name: String): Q = queues.computeIfAbsent(name, _ => new Q)

  def exists(name: String): Boolean = queues.containsKey(name)

  /** Queue bootstrap — the reference's SQS get-or-create contract
    * (`motorway/contrib/amazon_sqs/mixins.py:6-19`: `init_queue` looks
    * the queue up and creates it on NonExistentQueue). A ramp must be
    * startable against a queue nobody has produced to yet; the stream
    * calls this before its first offset read. Returns true when the
    * queue was created by this call (≙ the mixin's create_queue
    * branch), false when it already existed. */
  def ensureQueue(name: String): Boolean = {
    // the created flag is derived INSIDE the atomic computeIfAbsent —
    // a check-then-act (containsKey, then create) would let two
    // concurrent bootstrappers both observe "absent" and both report
    // created=true, breaking the mixin's create/found distinction
    var created = false
    queues.computeIfAbsent(name, { _ => created = true; new Q })
    created
  }

  /** Append `msgs` and return the offset of the FIRST appended entry,
    * atomically under the queue lock. Callers mapping offsets to
    * external bookkeeping (shard-sequence inflight lists, SQS receipt
    * handles) MUST use this return value: a separate `size()` read
    * followed by `enqueue` races with a concurrent producer on the same
    * queue — e.g. the old lease owner during a takeover window, whose
    * `owned` check passed just before the lease moved — and skews the
    * offset→external-id mapping, which would let checkpoints publish
    * sequences whose offsets were never committed. */
  def enqueue(name: String, msgs: Seq[Entry]): Long = q(name).synchronized {
    val start = q(name).entries.size.toLong
    q(name).entries ++= msgs
    start
  }

  def size(name: String): Long = q(name).synchronized(q(name).entries.size.toLong)

  def slice(name: String, from: Long, until: Long): Seq[Entry] = q(name).synchronized {
    q(name).entries.slice(from.toInt, until.toInt).toSeq
  }

  private val commitHooks =
    new ConcurrentHashMap[String, ArrayBuffer[(Long, Long) => Unit]]()

  /** Register a success callback fired inside [[commitUpTo]] with the
    * newly committed offset range [from, until) — the seam where an
    * external-system ack happens at exactly engine-commit time (≙ the
    * SQS ramp deleting messages in `success()`,
    * `contrib/amazon_sqs/ramps.py:28-31`). Hooks must not throw. */
  def onCommit(name: String)(hook: (Long, Long) => Unit): Unit = {
    // loop: a concurrent drop() can remove the buffer between the
    // computeIfAbsent and the append — re-fetch until the buffer we
    // locked is still the registered one
    var registered = false
    while (!registered) {
      val buf = commitHooks.computeIfAbsent(name, _ => new ArrayBuffer)
      buf.synchronized {
        if (commitHooks.get(name) eq buf) { buf += hook; registered = true }
      }
    }
  }

  /** Engine-driven success callback: everything below `upTo` is acked —
    * a real ramp would delete/commit in the external system here (and
    * registered [[onCommit]] hooks do exactly that). */
  def commitUpTo(name: String, upTo: Long): Unit = {
    val range = q(name).synchronized {
      val qu = q(name)
      if (upTo > qu.committed) {
        val from = qu.committed
        qu.acked ++= qu.entries.slice(qu.committed.toInt, upTo.toInt)
        qu.committed = upTo
        Some((from, upTo))
      } else None
    }
    range.foreach { case (from, until) =>
      Option(commitHooks.get(name)).toSeq
        .flatMap(h => h.synchronized(h.toVector))
        .foreach { hook =>
          // a throwing hook must not fail the engine's commit() — the
          // batch IS durably done; the external ack retries via the
          // next commit or redelivery (at-least-once)
          try hook(from, until)
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[queue-ramp-$name] commit hook failed: " +
              String.valueOf(e.getMessage))
            e.printStackTrace()
          }
        }
    }
  }

  def committed(name: String): Long = q(name).synchronized(q(name).committed)
  def ackedIds(name: String): Seq[String] = q(name).synchronized(q(name).acked.map(_.id).toSeq)
  def drop(name: String): Unit = { queues.remove(name); commitHooks.remove(name) }

  /** Mark the queue as DRAINING: its producer is finished forever (a
    * Kinesis shard closed by a reshard, fully enqueued). The engine
    * withholds `commit(end_N)` until it constructs batch N+1 — which
    * never happens on a queue that will never see another record — so
    * without this flag a closed shard's tail is never externally acked
    * and the lease checkpoint never reaches the shard's ending sequence:
    * the reshard handoff stalls with children forever unclaimable
    * (probed empirically: the final commit does not arrive on idle or
    * even across a query restart). With the flag set,
    * [[QueueRampProvider]]'s `latestOffset(start, _)` treats `start` as
    * committed — safe because the engine only asks for offsets after
    * `start` once the batch ending at `start` has fully completed (sink
    * write + commit log), i.e. the same trigger where `commit(start)`
    * would have fired had there been more data; the KCL SHARD_END
    * checkpoint special-case, expressed at the queue seam. Normal
    * (non-draining) queues keep the engine's own commit timing
    * untouched. */
  def markDrainable(name: String): Unit = q(name).synchronized { q(name).draining = true }
  def isDrainable(name: String): Boolean = q(name).synchronized(q(name).draining)
}
