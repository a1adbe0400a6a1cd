package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming (nation, brand) purchase counters — q394's continuous face
  * (32nd streaming face): live multiset brand profiles per nation, the
  * ingest-side state behind the weighted-Jaccard similarity matrix the
  * dedup tier generalizes to multisets.
  *
  * Contract: NONE on arrival order — counter increments commute (the
  * checksum/geo-cells class; the spec feeds fully shuffled chunks).
  * State is keyed by (nation, brand): 25 × 25 here, catalog-bounded at
  * ANY corpus scale, one long each. The rollup runs the SAME finishing
  * join the declared q394 runs
  * ([[graft.QueriesStats.weightedJaccardFinish]]), so converged state
  * reproduces the batch matrix bit for bit.
  */
object StreamingBrandMix extends Serializable {

  case class BrandEv(nation: String, brand: String)
  case class BrandCount(nation: String, brand: String, cnt: Long)

  def counters(evs: Dataset[BrandEv], streaming: Boolean): Dataset[BrandCount] = {
    import evs.sparkSession.implicits._

    def fn(key: (String, String), it: Iterator[BrandEv],
        state: GroupState[Long]): BrandCount = {
      var n = state.getOption.getOrElse(0L)
      it.foreach(_ => n += 1)
      if (streaming) state.update(n)
      BrandCount(key._1, key._2, n)
    }

    evs.groupByKey(e => (e.nation, e.brand))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Event feed: one (nation, brand) event per lineitem — the q394 cnt
    * derivation replayed as a stream.
    */
  def fromTables(s: SparkSession, dir: String): Dataset[BrandEv] = {
    import s.implicits._
    import graft.QueryDsl.tbl
    val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val o = tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val n = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("n_name").as("nation"), col("p_brand").as("brand"))
      .as[BrandEv]
  }

  /** Converged counters → the declared q394 matrix, via the SAME
    * finishing join the batch query runs.
    */
  def rollup(counts: DataFrame): DataFrame =
    graft.QueriesStats.weightedJaccardFinish(
      counts.select(col("nation").as("n_name"), col("brand").as("p_brand"),
        col("cnt")))
}
