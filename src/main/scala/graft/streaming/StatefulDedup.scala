package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** J2/T2 as streaming state: effectively-once delivery on top of an
  * at-least-once queue, keyed by the deterministic message id (J3).
  *
  * The reference probes a DynamoDB ledger per message before sending
  * (AzureTaskProducer/inventory_lib.py:146-162); in Structured
  * Streaming the ledger is the checkpointed state store — a
  * `flatMapGroupsWithState` keyed by msgId that emits only the first
  * sighting. State is partitioned by key across executors and survives
  * restarts via the checkpoint, which is exactly the dedup-table
  * contract at any scale.
  *
  * For bounded-lateness sources prefer watermarked eviction
  * ([[firstSightingWithin]]) so state doesn't grow unboundedly — the
  * reference ledger has the same unbounded-growth problem it never
  * solves (SURVEY J2 note).
  */
object StatefulDedup {

  /** Emit each key's first row only; all later sightings (within or
    * across micro-batches) are dropped. Unbounded state. */
  def firstSighting[T](ds: Dataset[T], keyFn: T => String)(
      implicit te: Encoder[T]): Dataset[T] =
    ds.groupByKey(keyFn)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(func = {
        (_: String, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      })(Encoders.scalaBoolean, te)

  /** Bounded-state variant: state for a key is dropped after the
    * processing-time timeout, after which a re-delivery would pass
    * again — the visibility-timeout trade the reference also makes
    * (redeliveries beyond the SQS dedup window re-execute). */
  def firstSightingWithin[T](ds: Dataset[T], keyFn: T => String,
                             timeoutMs: Long)(
      implicit te: Encoder[T]): Dataset[T] =
    ds.groupByKey(keyFn)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(func = {
        (_: String, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty
          } else {
            state.update(true)
            state.setTimeoutDuration(timeoutMs)
            rows.take(1)
          }
      })(Encoders.scalaBoolean, te)
}
