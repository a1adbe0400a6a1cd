package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Live CUSUM control chart — q441's continuous face (34th streaming
  * face): per-nation one-sided cumulative sums over the daily revenue
  * stream, with control limits TRAINED OFFLINE (target = mean cents,
  * slack = target/100, limit = 10·slack — exactly q441's constants,
  * passed in as a broadcastable map the way a deployed monitor carries
  * its trained limits) and the clamp-at-zero recursion
  * s⁺ ← max(0, s⁺ + (c − T − k)) run LITERALLY in bounded per-key state.
  *
  * The batch face computes the same statistic through the drawdown
  * IDENTITY (cum − min(0, runmin cum), KernelProps' pin); this face runs
  * the recursion itself — StreamingSpec pinning stream == batch is the
  * two sides of that identity meeting on real data.
  *
  * Contract: per-key ORDERED arrival across batches (the clamp fold is
  * order-dependent — the q365 drawdown face's class); within a batch
  * slice rows are day-sorted before folding, and a state guard (the
  * last folded day) makes a cross-batch violation THROW rather than
  * fold a wrong answer. State is eight longs per nation,
  * corpus-size-independent.
  */
object StreamingCusum extends Serializable {

  case class DayEv(nation: String, day: java.sql.Date, c: Long)
  case class CusumState(sup: Long, sdn: Long, nDays: Long, nUp: Long,
      nDn: Long, maxUp: Long, maxDn: Long, lastDayMs: Long = Long.MinValue)
  case class CusumRow(nation: String, n_days: Long, n_alarm_up: Long,
      n_alarm_down: Long, max_cusum_up: Long, max_cusum_down: Long)

  /** Event feed: the q441 daily grid as a day stream. */
  def fromDaily(daily: DataFrame): Dataset[DayEv] = {
    import daily.sparkSession.implicits._
    daily.select(col("nation"), col("d").as("day"), col("c")).as[DayEv]
  }

  /** Offline-trained limits per nation: (target, slack) — integer
    * divisions exactly as q441 derives them.
    */
  def trainLimits(daily: DataFrame): Map[String, (Long, Long)] =
    daily.groupBy(col("nation"))
      .agg(expr("sum(c) div count(*)").as("tt"))
      .collect().map { r =>
        val tt = r.getLong(1)
        r.getString(0) -> (tt, tt / 100)
      }.toMap

  def monitor(
      evs: Dataset[DayEv],
      limits: Map[String, (Long, Long)],
      streaming: Boolean = true): Dataset[CusumRow] = {
    import evs.sparkSession.implicits._
    def fn(nation: String, it: Iterator[DayEv],
        state: GroupState[CusumState]): CusumRow = {
      val (tt, k) = limits.getOrElse(nation, (0L, 0L))
      var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L, 0L, 0L, 0L, 0L))
      // ordered-arrival contract: fold the slice in day order; a slice
      // opening at-or-before the last folded day is a cross-batch
      // replay/out-of-order feed — the clamp recursion is order-DEFINED,
      // so FAIL LOUDLY (r11 drill) instead of folding a wrong answer.
      // Per-EVENT since r12: also catches a duplicate day INSIDE the
      // slice (sort hides it from a head-only check; the clamp
      // recursion would fold it twice).
      val sorted = it.toSeq.sortBy(_.day.getTime)
      sorted.foreach { ev =>
        if (st.lastDayMs != Long.MinValue && ev.day.getTime <= st.lastDayMs)
          throw new IllegalStateException(
            s"ordered-arrival contract violated for nation $nation: day " +
              s"${ev.day} arrived after state had folded day " +
              s"epoch-ms ${st.lastDayMs}")
        val sup = math.max(0L, st.sup + (ev.c - tt - k))
        val sdn = math.max(0L, st.sdn + (tt - ev.c - k))
        st = CusumState(sup, sdn, st.nDays + 1,
          st.nUp + (if (sup > k * 10) 1L else 0L),
          st.nDn + (if (sdn > k * 10) 1L else 0L),
          math.max(st.maxUp, sup), math.max(st.maxDn, sdn),
          ev.day.getTime)
      }
      if (streaming) state.update(st)
      CusumRow(nation, st.nDays, st.nUp, st.nDn, st.maxUp, st.maxDn)
    }
    evs.groupByKey(_.nation).mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }
}
