package graft.sources

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Generic polling ramp — the `sleep_time` loop shared by the
  * reference's Salesforce SOQL ramp (30-min `query_all`,
  * `contrib/salesforce/ramps.py:72-100`) and Recurly hourly scans
  * (`contrib/recurly_integration/ramps.py:12-51`): a driver-side
  * scheduler calls `poll()` on a fixed period and feeds the results
  * into a [[QueueRamp]] queue, which the DSv2 source turns into
  * micro-batches with commit-on-sink-success semantics.
  *
  * De-dup across polls is the caller's contract via stable message ids
  * (≙ invoice uuid / sobject Id) — at-least-once enqueue, idempotent
  * downstream (the reference's own guarantee level).
  */
final class PollingRamp(
    queue: String,
    periodMillis: Long)(poll: Long => Seq[QueueRamp.Entry]) extends AutoCloseable {

  private val tick = new AtomicLong(0)
  private var exec: ScheduledExecutorService = _

  def start(): PollingRamp = synchronized {
    require(exec == null, "already started")
    exec = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, s"polling-ramp-$queue"); t.setDaemon(true); t
    }
    exec.scheduleAtFixedRate(
      () => try QueueRamp.enqueue(queue, poll(tick.getAndIncrement()))
            catch { case scala.util.control.NonFatal(_) => () }, // next poll retries
      0, periodMillis, TimeUnit.MILLISECONDS)
    this
  }

  /** Run `n` polls synchronously (deterministic tests / AvailableNow). */
  def pollNow(n: Int = 1): Unit =
    (0 until n).foreach(_ => QueueRamp.enqueue(queue, poll(tick.getAndIncrement())))

  override def close(): Unit = synchronized {
    if (exec != null) { exec.shutdownNow(); exec = null }
  }
}
