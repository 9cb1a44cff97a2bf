package graft.sources

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import graft.pipeline.DeadLetter
import graft.streaming.PipelineStatsListener

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
  *
  * Failure posture: a failed poll is an OPERATIONAL EVENT, never
  * silence — the reference never swallows operator failures
  * (`motorway/pipeline.py:127-135` kills the whole pipeline on process
  * death; intersections capture tracebacks). A periodic scan must keep
  * polling through a transient outage, so instead of dying the ramp
  * routes every poll exception to `onFailure` — by default a stderr
  * report, or [[PollingRamp.reportTo]] to count it as a dead letter in
  * the stats listener (rendered with traceback at `/detail/<queue>/`).
  */
final class PollingRamp(
    queue: String,
    periodMillis: Long,
    onFailure: (Long, Throwable) => Unit = null)(
    poll: Long => Seq[QueueRamp.Entry]) extends AutoCloseable {

  private val tick = new AtomicLong(0)
  private var exec: ScheduledExecutorService = _
  private val reporter: (Long, Throwable) => Unit =
    Option(onFailure).getOrElse(PollingRamp.stderrReporter(queue))

  private def pollOnceReported(): Unit = {
    val t = tick.getAndIncrement()
    try QueueRamp.enqueue(queue, poll(t))
    catch {
      case scala.util.control.NonFatal(e) => // next poll retries — loudly
        try reporter(t, e)
        catch { case scala.util.control.NonFatal(_) => () } // a throwing
        // reporter must never cancel the schedule or mask the poll error
    }
  }

  def start(): PollingRamp = synchronized {
    require(exec == null, "already started")
    exec = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, s"polling-ramp-$queue"); t.setDaemon(true); t
    }
    exec.scheduleAtFixedRate(() => pollOnceReported(), 0, periodMillis,
      TimeUnit.MILLISECONDS)
    this
  }

  /** Run `n` polls synchronously (deterministic tests / AvailableNow).
    * Failures take the same reported path as the scheduled loop. */
  def pollNow(n: Int = 1): Unit =
    (0 until n).foreach(_ => pollOnceReported())

  override def close(): Unit = synchronized {
    if (exec != null) { exec.shutdownNow(); exec = null }
  }
}

object PollingRamp {

  /** Default reporter: timestamped stderr line + traceback. */
  def stderrReporter(queue: String): (Long, Throwable) => Unit = (t, e) => {
    System.err.println(
      s"[polling-ramp-$queue] poll $t failed: ${String.valueOf(e.getMessage)}")
    e.printStackTrace()
  }

  /** Route poll failures into the stats listener as dead letters: they
    * increment the queue's `failed` count (so `/api/status/` flips the
    * state heuristic to `failing`) and render with full traceback at
    * `/detail/<queue>/` — the reference's failed-message drill-down
    * (`motorway/controller.py:216-225`). */
  def reportTo(listener: PipelineStatsListener, queue: String): (Long, Throwable) => Unit =
    (t, e) => {
      val sw = new java.io.StringWriter()
      e.printStackTrace(new java.io.PrintWriter(sw))
      listener.recordDeadLetter(queue, DeadLetter(
        id = s"poll-$t",
        contentJson = "",
        errorMessage = String.valueOf(e.getMessage),
        stackTrace = sw.toString,
        operator = s"polling-ramp-$queue"))
    }
}
