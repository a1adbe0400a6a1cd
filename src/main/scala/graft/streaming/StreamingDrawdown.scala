package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming maximum-drawdown monitor — q365's continuous face (31st
  * streaming face): per-key running cumulative sum, running peak, and
  * the worst peak-to-trough drop so far, updated as daily revenue rows
  * arrive. The live ops analog: watch a nation's (or account's, or
  * SKU's) drawdown move without re-scanning the series.
  *
  * Contract: PER-KEY ORDERED arrival (date order within each key — the
  * [[Sessionizer]] class of face; keys may interleave arbitrarily and
  * chunking is free, which is what the spec shuffles). A cumulative
  * sum is order-DEFINED, so unlike the commutative-counter faces this
  * one declares the ordering requirement instead of pretending it away.
  * State per key is four longs — O(keys), nothing grows with rows.
  *
  * All arithmetic is exact BIGINT cents, mirroring the batch query's
  * no-float contract.
  */
object StreamingDrawdown extends Serializable {

  /** `seq` is the event's position on the key's timeline (day index or
    * any strictly-increasing marker). −1 (the default) means the feed
    * carries no marker and the ordered-arrival contract is taken on
    * trust, exactly as before; a real deployment feeds the date, which
    * arms the state guard below.
    */
  case class DayRevenue(key: String, cents: Long, seq: Long = -1L)
  case class DrawdownState(cum: Long, peak: Long, maxDd: Long, nDays: Long,
      lastSeq: Long = Long.MinValue)

  def monitor(evs: Dataset[DayRevenue]): Dataset[(String, Long, Long)] = {
    import evs.sparkSession.implicits._

    def fn(key: String, it: Iterator[DayRevenue],
        state: GroupState[DrawdownState]): (String, Long, Long) = {
      var st = state.getOption.getOrElse(DrawdownState(0L, 0L, 0L, 0L))
      it.foreach { e =>
        // Ordered-arrival state guard (r11 drill), armed when the feed
        // carries seq markers: a replayed/late event would silently
        // corrupt the cumulative line — fail loudly instead.
        if (e.seq >= 0L && st.lastSeq != Long.MinValue && e.seq <= st.lastSeq)
          throw new IllegalStateException(
            s"ordered-arrival contract violated for key $key: seq=${e.seq} " +
              s"arrived after state had folded seq=${st.lastSeq}")
        val cum = st.cum + e.cents
        val peak = math.max(st.peak, cum)
        // First row initializes the peak AT the first cum (the batch
        // window's running max over a 1-row prefix), so a negative
        // first day is a 0 drawdown, exactly like the batch face.
        val p = if (st.nDays == 0L) cum else peak
        st = DrawdownState(cum, p, math.min(st.maxDd, cum - p), st.nDays + 1,
          if (e.seq >= 0L) e.seq else st.lastSeq)
      }
      state.update(st)
      (key, st.nDays, st.maxDd)
    }

    evs.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Batch feed: the q365 daily grid rendered as per-key DATE-ORDERED
    * events (the spec collects per key, keeps each key's order, and
    * interleaves keys arbitrarily).
    */
  def fromDailyGrid(daily: DataFrame): Dataset[(String, Seq[Long])] = {
    import daily.sparkSession.implicits._
    daily.groupBy(col("nation"))
      .agg(array_sort(collect_list(struct(col("d"), col("c")))).as("s"))
      .select(col("nation"),
        expr("transform(s, x -> x.c)").as("cs"))
      .as[(String, Seq[Long])]
  }
}
