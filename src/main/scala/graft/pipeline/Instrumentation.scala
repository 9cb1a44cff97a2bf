package graft.pipeline

/** Pluggable APM seam around operator `process` calls — the Spark
  * mapping of the reference's `instrumentation_manager`
  * (`motorway/instrumentation.py:12-18`, wrapped around every
  * `process()` at `motorway/intersection.py:149`): a context manager
  * that is a no-op unless an APM vendor is configured, in which case
  * each process call runs inside a named background task.
  *
  * The seam is a per-JVM singleton, like the reference's module-level
  * env-gated flag. On local[*] one `install` covers everything; on a
  * real cluster, `process` runs on executors, so a production adapter
  * installs from an executor plugin (`org.apache.spark.api.plugin
  * .SparkPlugin#executorPlugin` init — the standard per-executor-JVM
  * bootstrap hook) rather than from the driver. Metrics-level
  * observability does not need this at all —
  * [[graft.streaming.PipelineStatsListener]] is the superset of the
  * reference's controller stats; this seam exists for trace-level APM
  * spans only, matching the reference's scope.
  */
trait Instrumentation extends Serializable {
  /** Run `body` inside a vendor span named `taskName`
    * (≙ `newrelic.agent.BackgroundTask(app, task_name)`). */
  def around[T](taskName: String)(body: => T): T
}

object Instrumentation {
  /** ≙ the reference's NEW_RELIC=False path: plain passthrough. */
  object NoOp extends Instrumentation {
    def around[T](taskName: String)(body: => T): T = body
  }

  @volatile private var current: Instrumentation = NoOp

  /** Install a vendor adapter for this JVM (≙ the import-succeeded +
    * config-env-present activation, `instrumentation.py:3-9`). */
  def install(i: Instrumentation): Unit = current = i

  /** Back to passthrough (tests; app shutdown). */
  def uninstall(): Unit = current = NoOp

  def active: Instrumentation = current
}
