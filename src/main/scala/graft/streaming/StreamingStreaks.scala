package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming gaps-and-islands — q220's continuous face (22nd streaming
  * face): each user's longest run of consecutive active days is
  * maintained live as events arrive, instead of re-deriving the islands
  * from the full day history.
  *
  * Contract: per-key (per-user) ordered arrival across micro-batches —
  * the keyed-Kafka/CDC guarantee shared by [[StreamingAttribution]] and
  * [[StreamingTransitions]]; within a micro-batch rows may arrive
  * unordered (the group fn dedups and sorts the batch's days). Under
  * that contract the per-user snapshot after any prefix equals the
  * batch islands computation over that prefix, and at convergence the
  * longest-streak histogram EQUALS the declared q220 query exactly
  * (StreamingSpec pins both).
  *
  * State is O(1) per user — last active day, current run length,
  * best run length — the whole point vs the batch windowed form, whose
  * state is the user's full distinct-day list.
  */
object StreamingStreaks extends Serializable {

  case class DayEv(user_id: Long, day: Long)

  /** last = most recent active day seen (Long.MinValue before any);
    * cur/best = current and longest consecutive-day run lengths.
    */
  case class StreakState(last: Long, cur: Long, best: Long)
  case class StreakRow(user_id: Long, streak_days: Long)

  /** Longest consecutive-day streak per user over the input seen so
    * far. Batch and streaming run the same group function (the
    * Sessionizer duality); batch = one group call holding all rows.
    */
  def longest(events: Dataset[DayEv], streaming: Boolean): Dataset[StreakRow] = {
    import events.sparkSession.implicits._

    def fn(user: Long, rows: Iterator[DayEv],
        state: GroupState[StreakState]): StreakRow = {
      var s = state.getOption.getOrElse(StreakState(Long.MinValue, 0L, 0L))
      rows.map(_.day).toSeq.distinct.sorted.foreach { d =>
        if (d != s.last) {
          val cur = if (d == s.last + 1) s.cur + 1 else 1L
          s = StreakState(d, cur, math.max(s.best, cur))
        }
      }
      if (streaming) state.update(s)
      StreakRow(user, s.best)
    }

    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Adapter: (user, epoch-day) rows from an events frame (read through
    * [[graft.Tables.events]] so `ts` is TimestampType) — the same
    * integer day arithmetic as the declared q220.
    */
  def fromEvents(df: DataFrame): Dataset[DayEv] = {
    import df.sparkSession.implicits._
    df.select(col("user_id"),
      expr("div(unix_micros(ts), 86400000000)").as("day")).as[DayEv]
  }
}
