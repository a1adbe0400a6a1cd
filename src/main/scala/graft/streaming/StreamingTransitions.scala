package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Markov-transition extraction — q172's continuous face
  * (19th streaming face): per-user event streams are chained into
  * (current → next) transition rows as they arrive, with ONE
  * (timestamp, id, type) triple of state per user.
  *
  * Contract: per-key (per-user) ordered arrival across micro-batches —
  * the guarantee a keyed Kafka topic or any CDC feed provides. Within a
  * micro-batch rows may arrive unordered (the group fn sorts its
  * buffered rows by (us, event_id)); across batches the stored last
  * event chains the sequences together. Under that contract the emitted
  * transition multiset EQUALS the batch lead()-window pairs exactly —
  * the spec proves it against the same q172 formulation.
  *
  * State is O(1) per user (contrast the funnel's three timestamps and
  * the KL monitor's vocabulary-bounded map): this face shows the
  * cheapest possible stateful shape — pure chaining, no accumulation.
  */
object StreamingTransitions extends Serializable {

  case class Ev(user_id: Long, event_id: Long, event_type: String, us: Long)
  case class LastEvent(us: Long, event_id: Long, event_type: String)
  case class Transition(user_id: Long, cur: String, nxt: String, us: Long)

  /** (cur → nxt) transition rows, one per consecutive event pair per
    * user. Batch and streaming run the same group function (the
    * Sessionizer duality); batch = one group call holding all rows.
    */
  def transitions(events: Dataset[Ev], streaming: Boolean): Dataset[Transition] = {
    import events.sparkSession.implicits._

    def fn(
        user: Long,
        rows: Iterator[Ev],
        state: GroupState[LastEvent]): Iterator[Transition] = {
      val sorted = rows.toSeq.sortBy(e => (e.us, e.event_id))
      var last = state.getOption
      // Ordered-arrival state guard (r11 drill, per-EVENT since r12):
      // an event at-or-before the last folded (us, event_id) — a
      // cross-batch replay OR an exact duplicate inside the slice —
      // would emit a transition the batch face never sees; fail loudly
      // instead of mis-chaining.
      val out = Seq.newBuilder[Transition]
      sorted.foreach { e =>
        last.foreach { l =>
          if (Ordering[(Long, Long)].lteq((e.us, e.event_id), (l.us, l.event_id)))
            throw new IllegalStateException(
              s"ordered-arrival contract violated for user $user: event " +
                s"(us=${e.us}, id=${e.event_id}) arrived after state had " +
                s"folded (us=${l.us}, id=${l.event_id})")
          out += Transition(user, l.event_type, e.event_type, e.us)
        }
        last = Some(LastEvent(e.us, e.event_id, e.event_type))
      }
      if (streaming) last.foreach(state.update)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Adapter: typed event rows from an events frame (ts already
    * normalized to TimestampType — read through [[graft.Tables.events]]).
    */
  def fromEvents(df: DataFrame): Dataset[Ev] = {
    import df.sparkSession.implicits._
    df.select(col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us")).as[Ev]
  }
}
