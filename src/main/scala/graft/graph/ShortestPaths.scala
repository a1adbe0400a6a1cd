package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop single-source shortest paths (Bellman–Ford rounds) over a
  * weighted edge table — the cost-propagation member of the graph tier
  * (BFS trees in [[Trees]] propagate structure, [[PageRank]] propagates
  * mass; this propagates MIN-cost labels).
  *
  * Each round relaxes every edge once: dist(v) ← min(dist(v),
  * min over in-edges (dist(u) + w)). `rounds` bounds path length in
  * hops, so the result is exactly "cheapest path using ≤ rounds edges" —
  * a deterministic, oracle-replayable semantic (full convergence is the
  * rounds = |V|−1 special case; fixed rounds keep the unrolled-SQL
  * oracle finite, the q161/q163 discipline).
  *
  * Scale shape per round: one edge-scan join keyed on src + one
  * map-combinable min keyed on dst; distance state is node-sized and
  * re-pinned per round ([[Closure]] lineage rule). Only reached nodes
  * carry rows — the frontier table never exceeds |V|.
  */
object ShortestPaths {

  /** (node, dist) for every node reachable from `sources` within
    * `rounds` hops. Edge weights must be non-negative; pass both
    * directions for undirected semantics.
    */
  def boundedHops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      sources: DataFrame,
      sourceCol: String,
      rounds: Int): DataFrame =
    multiBoundedHops(edges, srcCol, dstCol, wCol,
      sources.select(lit(0L).as("probe"), col(sourceCol).as("node")),
      rounds).drop("probe")

  /** Multi-source variant: `sources` carries (probe, node) and every
    * probe's independent Bellman–Ford runs in the SAME `rounds` joins,
    * keyed on (probe, node) — k probes cost the round count once instead
    * of k times (k× fewer jobs/checkpoints; per-round shuffles carry the
    * union of the k frontiers, which is the same total bytes the k
    * separate runs moved). Identical per-probe results: relaxation never
    * crosses probe keys.
    */
  def multiBoundedHops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      sources: DataFrame,
      rounds: Int): DataFrame = {
    import org.apache.spark.sql.graft.Pin
    // r13 iteration scheme (Pin scaladoc): lazy pins chain all rounds
    // into one job; edges hash-pinned once on the relaxation join key.
    val e = Pin.pinHashed(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("double").as("w")), Seq("src"), eager = false)
    var dist = Pin.pin(sources.select(col("probe"), col("node")).distinct()
      .withColumn("dist", lit(0.0)), eager = false)
    for (_ <- 1 to rounds) {
      val relaxed = e
        .join(dist.select(col("probe"), col("node").as("src"), col("dist")),
          Seq("src"))
        .select(col("probe"), col("dst").as("node"),
          (col("dist") + col("w")).as("cand"))
      dist = Pin.pinKeep(
        dist.select(col("probe"), col("node"), col("dist").as("cand"))
          .unionByName(relaxed)
          .groupBy(col("probe"), col("node")).agg(min(col("cand")).as("dist")),
        eager = false)
    }
    dist
  }
}
