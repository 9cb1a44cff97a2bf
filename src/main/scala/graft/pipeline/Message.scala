package graft.pipeline

import java.sql.Timestamp

/** Engine-canonical message envelope — the Spark mapping of motorway's
  * `Message` (reference `motorway/messages.py:20-35`): `id` ≙
  * `ramp_unique_id`, `content` ≙ JSON payload (typed here — Catalyst
  * needs schemas to prune/push down), `groupingValue` ≙ routing key for
  * `HashRing` grouping (`motorway/grouping.py:20-35`).
  *
  * Dropped relative to the reference: `ack_value` and `producer_uuid`
  * (`messages.py:66-76`) — Storm-style XOR ack trees
  * (`motorway/controller.py:97-129`) are subsumed by micro-batch offset
  * commit + checkpointing, and `eventTime` is added (the reference has
  * no event time at all, SURVEY.md §1.3) so watermarked windows work.
  */
final case class Message[T](
    id: String,
    content: T,
    groupingValue: Option[String] = None,
    eventTime: Option[Timestamp] = None) {

  /** Spin-off ≙ `Message.new(parent, content)` (`messages.py:37-48`):
    * the child keeps the parent's id, so per-batch lineage treats the
    * derived row as part of the same delivery unit. */
  def spinOff[U](newContent: U, grouping: Option[String] = None): Message[U] =
    Message(id, newContent, grouping.orElse(groupingValue), eventTime)
}

/** A failed message routed to the dead-letter stream instead of
  * poisoning its micro-batch — the per-message `fail()` semantics of
  * `motorway/intersection.py:135-143` + traceback capture of
  * `messages.py:133-149`, adapted to batch-committed execution
  * (SURVEY.md §7.4 "poison message" mitigation). */
final case class DeadLetter(
    id: String,
    contentJson: String,
    errorMessage: String,
    stackTrace: String,
    operator: String)
