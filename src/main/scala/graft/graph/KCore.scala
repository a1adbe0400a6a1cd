package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling (Seidman 1983, the distributed formulation of
  * Montresor et al. 2013): repeatedly delete every node whose degree in
  * the CURRENT surviving subgraph is < k; what survives to fixpoint is
  * the k-core — the standard cohesion filter a curation pipeline applies
  * before community/centrality math (it strips the low-degree fringe
  * that dominates raw co-occurrence graphs).
  *
  * Determinism contract: `rounds` SYNCHRONOUS peel sweeps from the full
  * graph (every sub-threshold node removed simultaneously per sweep, the
  * [[LabelPropagation]] discipline) — a pure integer function of the
  * edge set, so the cross-engine oracle replays each sweep as an
  * unrolled MATERIALIZED CTE. Peeling is monotone (the survivor set only
  * shrinks and each sweep's removals depend only on the previous
  * survivor set), so if the sweeps converge early the result IS the true
  * k-core; extra sweeps are no-ops.
  *
  * Scale shape per sweep: one edge-scan degree count (map-combinable,
  * node-sized result) + two semi-joins of the edge set against the
  * node-sized survivor set — edge-sized shuffles only, never all-pairs,
  * no windows. Edge state is re-pinned per sweep ([[Closure]]/
  * [[PageRank]] lineage discipline); nothing reaches the driver.
  */
object KCore {

  /** Surviving (node, degree) after `rounds` synchronous peel sweeps
    * toward the k-core. `edges` must be undirected-unique (one row per
    * pair, src < dst); degree counts both endpoints.
    */
  def peel(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import org.apache.spark.sql.graft.Pin
    // r13: lazy pins — the fixed peel sweeps chain into one job (the
    // sweep count is fixed, so no per-round driver decision needs the
    // rows materialized early).
    def pin(df: DataFrame): DataFrame = Pin.pin(df, eager = false)

    def degrees(e: DataFrame): DataFrame = e
      .select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("deg"))

    var e = pin(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull))
    for (_ <- 1 to rounds) {
      val keep = pin(degrees(e).filter(col("deg") >= k).select(col("node")))
      e = pin(e
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")))
    }
    // Nodes that lost every edge vanish from the endpoint scan — the
    // survivor set is exactly the endpoints of the surviving edges.
    degrees(e)
  }
}
