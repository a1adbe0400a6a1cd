package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming geohash-cell occupancy — q266's continuous face (27th
  * streaming face): live point counts per geohash cell, the ingest-side
  * monitor for the spatial tier (cell occupancy is what sizes the grid
  * join's per-task work, so an operator watching a stream of points
  * knows when a cell is running hot BEFORE the batch join does).
  *
  * Contract: NONE on arrival order — counter increments commute (the
  * checksum/backlog class; the spec feeds fully shuffled chunks). State
  * is keyed by CELL: the key space is grid-bounded (2^(5·chars) ids,
  * 1024 at 2-char precision) and each state is one long.
  */
object StreamingGeoCells extends Serializable {

  case class PointEv(cell: Long)
  case class CellCount(cell: Long, n_points: Long)

  def counters(evs: Dataset[PointEv], streaming: Boolean): Dataset[CellCount] = {
    import evs.sparkSession.implicits._

    def fn(cell: Long, it: Iterator[PointEv],
        state: GroupState[Long]): CellCount = {
      var n = state.getOption.getOrElse(0L)
      it.foreach(_ => n += 1)
      if (streaming) state.update(n)
      CellCount(cell, n)
    }

    evs.groupByKey(_.cell).mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Event feed from the batch customer table: the same deterministic
    * coordinates and geohash kernel the declared q266 uses.
    */
  def fromCustomers(customers: DataFrame): Dataset[PointEv] = {
    import customers.sparkSession.implicits._
    customers.select(graft.spatial.Geohash.cellNative(
        graft.spatial.Geo.latOf(col("c_custkey")),
        graft.spatial.Geo.lonOf(col("c_custkey")), 2).as("cell"))
      .as[PointEv]
  }

  /** Converged counters → the declared q266 row shape. */
  def rollup(counts: DataFrame): DataFrame =
    counts.select(graft.spatial.Geohash.base32Col("cell", 2).as("geohash"),
      col("cell"), col("n_points"))
}
