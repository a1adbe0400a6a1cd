package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming first/last-touch attribution — q206's continuous face
  * (20th streaming face): each user's conversion credit is maintained
  * live as events arrive, instead of recomputed from the full history.
  *
  * Contract: per-key (per-user) ordered arrival across micro-batches —
  * the keyed-Kafka/CDC guarantee, same as [[StreamingTransitions]];
  * within a micro-batch rows may arrive unordered (the group fn sorts
  * by (us, event_id)). Under that contract the per-user attribution
  * snapshot after any prefix equals the batch q206 windows over that
  * prefix, and at convergence the channel rollup EQUALS the declared
  * q206 query exactly (the spec pins both).
  *
  * State is O(1) per user — first-event channel, the last event seen
  * before conversion, and the converting purchase — and FREEZES at
  * conversion: a converted user's later events are never buffered, so
  * the hot path of a long-lived stream touches only unconverted users.
  * Update mode: the sink always holds each user's latest attribution.
  */
object StreamingAttribution extends Serializable {

  case class Ev(user_id: Long, event_id: Long, event_type: String,
      us: Long, value: Double)

  /** last_ch == null ⇔ no event strictly precedes the first purchase
    * (the purchase opened the user's history). converted == false ⇒
    * p_value is 0 and last_ch tracks the running last event.
    */
  case class AttState(first_ch: String, last_ch: String,
      p_value: Double, converted: Boolean,
      lastUs: Long = Long.MinValue, lastEid: Long = Long.MinValue)
  case class AttRow(user_id: Long, first_ch: String, last_ch: String,
      p_value: Double, converted: Boolean)

  /** Latest attribution snapshot per user seen in the input. Batch and
    * streaming run the same group function (the Sessionizer duality);
    * batch = one group call holding all rows.
    */
  def attribution(events: Dataset[Ev], streaming: Boolean): Dataset[AttRow] = {
    import events.sparkSession.implicits._

    def fn(user: Long, rows: Iterator[Ev],
        state: GroupState[AttState]): AttRow = {
      var s = state.getOption.getOrElse(AttState(null, null, 0.0, false))
      val sorted = rows.toSeq.sortBy(e => (e.us, e.event_id))
      // Ordered-arrival state guard (r11 drill, per-EVENT since r12):
      // an event at-or-before the last folded (us, event_id) means a
      // cross-batch replay/out-of-order feed — or an exact duplicate
      // inside the slice, which sort would hide from a head-only check —
      // the fold's answer would be silently wrong, so FAIL LOUDLY
      // (the streaming analog of the NOT_CONVERGED poison row).
      sorted.foreach { e =>
        if (s.lastUs != Long.MinValue &&
            Ordering[(Long, Long)].lteq((e.us, e.event_id), (s.lastUs, s.lastEid)))
          throw new IllegalStateException(
            s"ordered-arrival contract violated for user $user: event " +
              s"(us=${e.us}, id=${e.event_id}) arrived after state had " +
              s"folded (us=${s.lastUs}, id=${s.lastEid})")
        if (!s.converted) {
          if (s.first_ch == null) s = s.copy(first_ch = e.event_type)
          if (e.event_type == "purchase")
            s = s.copy(p_value = e.value, converted = true)
          else
            s = s.copy(last_ch = e.event_type)
        }
        s = s.copy(lastUs = e.us, lastEid = e.event_id)
      }
      if (streaming) state.update(s)
      AttRow(user, s.first_ch, s.last_ch, s.p_value, s.converted)
    }

    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Adapter: typed event rows from an events frame (read through
    * [[graft.Tables.events]] so `ts` is TimestampType).
    */
  def fromEvents(df: DataFrame): Dataset[Ev] = {
    import df.sparkSession.implicits._
    df.select(col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"), col("value")).as[Ev]
  }
}
