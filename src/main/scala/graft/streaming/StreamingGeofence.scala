package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming geofence occupancy — q337's continuous face (28th
  * streaming face): live inside/total counters per nation key, the
  * ingest-side monitor for the fence test (an operator watching a point
  * stream sees fence occupancy move BEFORE the batch rollup runs).
  *
  * Contract: NONE on arrival order — both counters are commutative
  * increments (the checksum/backlog class; the spec feeds fully
  * shuffled chunks). State is keyed by NATION: the key space is
  * dimension-bounded and each state is two longs.
  */
object StreamingGeofence extends Serializable {

  case class FenceEv(nationkey: Long, inside: Boolean)
  case class FenceCount(nationkey: Long, n_total: Long, n_inside: Long)

  def counters(evs: Dataset[FenceEv], streaming: Boolean): Dataset[FenceCount] = {
    import evs.sparkSession.implicits._

    def fn(key: Long, it: Iterator[FenceEv],
        state: GroupState[(Long, Long)]): FenceCount = {
      var (tot, ins) = state.getOption.getOrElse((0L, 0L))
      it.foreach { e => tot += 1; if (e.inside) ins += 1 }
      if (streaming) state.update((tot, ins))
      FenceCount(key, tot, ins)
    }

    evs.groupByKey(_.nationkey)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Event feed from the batch customer table: the same deterministic
    * coordinates and shared fence kernel the declared q337 uses.
    */
  def fromCustomers(customers: DataFrame): Dataset[FenceEv] = {
    import customers.sparkSession.implicits._
    customers.select(col("c_nationkey").cast("long").as("nationkey"),
        graft.spatial.Geo.insideFence(
          graft.spatial.Geo.latOf(col("c_custkey")),
          graft.spatial.Geo.lonOf(col("c_custkey"))).as("inside"))
      .as[FenceEv]
  }

  /** Converged counters → the declared q337 row shape (the nation-name
    * join and share ratio happen here, off the tiny counter table).
    */
  def rollup(counts: DataFrame, nation: DataFrame): DataFrame =
    counts.join(broadcast(nation),
        counts("nationkey") === nation("n_nationkey"))
      .select(col("n_name").as("nation"), col("n_total"), col("n_inside"),
        round(col("n_inside").cast("double")
          / col("n_total").cast("double"), 6).as("share"))
}
