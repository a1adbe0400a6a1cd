package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming order-backlog counters — q267's continuous face (26th
  * streaming face): per-day (arrivals, completions) counters maintained
  * live, so the open-orders (Little's-law WIP) curve is a day-grid
  * rollup of the converged counters instead of a history re-scan.
  *
  * Contract: NONE on arrival order — counter increments commute (the
  * checksum/AbSpend class; the spec feeds fully shuffled chunks). State
  * is keyed by DAY: the key space is calendar-bounded at any corpus
  * size, each state is two longs, and the stateful stage is
  * key-parallel.
  */
object StreamingBacklog extends Serializable {

  /** One order's contribution: +1 arrival on its placement day, +1
    * completion on its last-ship day (two events per order).
    */
  case class DayEv(day: String, arrived: Long, completed: Long)
  case class DayCounts(day: String, arrivals: Long, completions: Long)

  def counters(evs: Dataset[DayEv], streaming: Boolean): Dataset[DayCounts] = {
    import evs.sparkSession.implicits._

    def fn(day: String, it: Iterator[DayEv],
        state: GroupState[(Long, Long)]): DayCounts = {
      var (a, c) = state.getOption.getOrElse((0L, 0L))
      it.foreach { e => a += e.arrived; c += e.completed }
      if (streaming) state.update((a, c))
      DayCounts(day, a, c)
    }

    evs.groupByKey(_.day).mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Event feed from the batch tables: each order emits its arrival and
    * its completion (max ship day over its lines).
    */
  def fromTables(orders: DataFrame, lineitem: DataFrame): Dataset[DayEv] = {
    import orders.sparkSession.implicits._
    val arr = orders.select(
      date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd").as("day"),
      lit(1L).as("arrived"), lit(0L).as("completed"))
    val dep = lineitem.groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate").cast("date")).as("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        lit(0L).as("arrived"), lit(1L).as("completed"))
    arr.union(dep).as[DayEv]
  }

  /** Converged counters → the declared q267 row shape (day-grid cumsum
    * via the triangular-join rank — calendar-bounded).
    */
  def rollup(counts: DataFrame): DataFrame =
    graft.operators.ScalableWindow.boundedRankCum(
      counts.select(col("day"), col("arrivals"), col("completions")),
      Seq(("day", true)), "t",
      Seq(("arrivals", "ca"), ("completions", "cc")))
      .select(col("day"), col("arrivals"), col("completions"),
        (col("ca") - col("cc")).as("open_orders"))
}
