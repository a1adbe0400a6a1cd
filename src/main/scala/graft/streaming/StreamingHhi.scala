package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming market-concentration counters — q446's continuous face
  * (35th streaming face): live revenue-cents accumulators per
  * (nation, year, brand), the ingest-side state behind the HHI table a
  * competition monitor reads.
  *
  * Contract: NONE on arrival order — exact-integer cent sums commute
  * (the BrandMix/checksum class; the spec feeds fully shuffled chunks).
  * State is keyed by (nation, yr, brand): catalog × calendar bounded at
  * ANY corpus scale, one long each. The rollup runs the SAME finishing
  * math the declared q446 runs ([[graft.QueriesStats.hhiFinish]]), so
  * converged state reproduces the batch HHI rows bit for bit.
  */
object StreamingHhi extends Serializable {

  case class RevEv(nation: String, yr: Int, brand: String, cents: Long)
  case class RevCell(nation: String, yr: Int, brand: String, rev: Long)

  def counters(evs: Dataset[RevEv], streaming: Boolean): Dataset[RevCell] = {
    import evs.sparkSession.implicits._

    def fn(key: (String, Int, String), it: Iterator[RevEv],
        state: GroupState[Long]): RevCell = {
      var r = state.getOption.getOrElse(0L)
      it.foreach(e => r += e.cents)
      if (streaming) state.update(r)
      RevCell(key._1, key._2, key._3, r)
    }

    evs.groupByKey(e => (e.nation, e.yr, e.brand))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Event feed: one revenue event per 1995–1997 lineitem — q446's cell
    * derivation replayed as a stream.
    */
  def fromTables(s: SparkSession, dir: String): Dataset[RevEv] = {
    import s.implicits._
    import graft.QueryDsl.{tbl, dec}
    val li = tbl(s, dir, "lineitem").select(col("l_orderkey"),
      col("l_partkey"), year(col("l_shipdate")).as("yr"),
      (col("l_extendedprice").cast(dec) * 100).cast("long").as("cents"))
      .filter(col("yr").isin(1995, 1996, 1997))
    val o = tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val n = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("n_name").as("nation"), col("yr"),
        col("p_brand").as("brand"), col("cents"))
      .as[RevEv]
  }

  /** Converged cells → the declared q446 rows, via the SAME finish. */
  def rollup(cells: DataFrame): DataFrame =
    graft.QueriesStats.hhiFinish(
      cells.select(col("nation"), col("yr"),
        col("brand").as("p_brand"), col("rev")))
}
