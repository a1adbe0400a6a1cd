package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming A/B spend accumulator — q222's continuous face (23rd
  * streaming face): each user's exact-cents purchase total is
  * maintained live, so the Welch mean-value z-test can be recomputed
  * from user-level sufficient statistics at any moment instead of
  * re-scanning history.
  *
  * Contract: NONE on arrival order — per-user state is a single
  * integer-cents sum and addition commutes, so arbitrary interleaving
  * across and within micro-batches converges to the batch result (the
  * DDSketch/StreamingQuantiles class of face, not the ordered-arrival
  * Sessionizer class; the spec feeds fully shuffled chunks).
  *
  * State is O(1) per user (variant + running cents). The variant is the
  * same deterministic hash split as the declared query (user_id mod 2).
  */
object StreamingAbSpend extends Serializable {

  case class Purchase(user_id: Long, cents: Long)
  case class SpendRow(user_id: Long, variant: Long, cents: Long)

  /** Latest per-user spend snapshot. Batch and streaming run the same
    * group function; batch = one group call holding all rows.
    */
  def spend(purchases: Dataset[Purchase], streaming: Boolean): Dataset[SpendRow] = {
    import purchases.sparkSession.implicits._

    def fn(user: Long, rows: Iterator[Purchase],
        state: GroupState[Long]): SpendRow = {
      var c = state.getOption.getOrElse(0L)
      rows.foreach(p => c += p.cents)
      if (streaming) state.update(c)
      SpendRow(user, user % 2, c)
    }

    purchases.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Adapter: purchase events as exact integer cents (the q222 cast). */
  def fromEvents(df: DataFrame): Dataset[Purchase] = {
    import df.sparkSession.implicits._
    df.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"))
      .as[Purchase]
  }
}
