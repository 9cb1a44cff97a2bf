package graft.sinks

/** Partial-retry batch writer — the put-records pattern of the
  * reference's Kinesis sink (`contrib/amazon_kinesis/intersections.py:
  * 10-69`): send a bounded batch, inspect per-record results, retry only
  * throttled/transient failures, surface hard failures.
  *
  * Transport-agnostic: `send` returns per-record outcomes; the writer
  * loops until everything succeeded, retries are exhausted, or a hard
  * error appears. Used from `foreachBatch`/`ForeachWriter` partitions —
  * each partition drives its own writer, so there is no driver-side
  * bottleneck.
  */
object RetryingBatchWriter {
  sealed trait Outcome
  case object Ok extends Outcome
  /** Transient (≙ ProvisionedThroughputExceeded/InternalFailure — retry). */
  case object Retryable extends Outcome
  /** Permanent (≙ validation error — dead-letter, don't retry). */
  final case class Hard(reason: String) extends Outcome

  final case class Result[T](succeeded: Seq[T], failed: Seq[(T, String)], attempts: Int)

  /** @param maxBatch max records per send (≤500 for Kinesis, ≤500 for
    *                 the controller's ingest batch `controller.py:63`)
    * @param maxRetries attempts per record before giving up */
  def writeAll[T](records: Seq[T], maxBatch: Int = 500, maxRetries: Int = 3)(
      send: Seq[T] => Seq[Outcome]): Result[T] = {
    var attempts = 0
    val ok = Seq.newBuilder[T]
    val hard = Seq.newBuilder[(T, String)]
    var pending = records
    var retriesLeft = maxRetries
    while (pending.nonEmpty && retriesLeft > 0) {
      attempts += 1
      retriesLeft -= 1
      val next = Seq.newBuilder[T]
      pending.grouped(maxBatch).foreach { chunk =>
        val outcomes = send(chunk)
        require(outcomes.length == chunk.length, "send must return one outcome per record")
        chunk.lazyZip(outcomes).foreach {
          case (r, Ok)           => ok += r
          case (r, Retryable)    => next += r
          case (r, Hard(reason)) => hard += ((r, reason))
        }
      }
      pending = next.result()
    }
    hard ++= pending.map(r => (r, s"retries exhausted after $maxRetries attempts"))
    Result(ok.result(), hard.result(), attempts)
  }
}
