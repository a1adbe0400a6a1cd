package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities) by synchronous power iteration — the
  * link-analysis companion to [[PageRank]], same execution shape: per
  * iteration TWO edge-scan hash joins + map-combinable sums over
  * node-sized state, lineage re-pinned per round, nothing but the plan
  * reaches the driver.
  *
  * Each half-step max-normalizes (divide by the max score — an
  * order-free aggregate, unlike the L2/sum norms whose float folds are
  * order-dependent), so scores stay O(1) across iterations and the
  * final 8-dp rounding erases the ~1e-15 reorder noise of the per-node
  * float sums (the q163 determinism argument).
  */
object Hits {

  /** Hub/authority scores after `iters` synchronous iterations from the
    * all-ones start. `edges` are directed (src → dst); nodes = every
    * endpoint.
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5): DataFrame = {
    val spark = edges.sparkSession
    import org.apache.spark.sql.graft.Pin

    // r13 iteration scheme (see Pin scaladoc): every pin is LAZY, so the
    // whole fixed-round loop compiles into ONE job instead of a driver
    // barrier per half-step; the edge frame is materialized TWICE, hash-
    // pinned on each half-step's join key (src for the a-step, dst for
    // the h-step), so neither half-step re-exchanges edge-sized data;
    // and the raw per-half-step scores are pinned BEFORE max-
    // normalization — previously the unpinned aRaw/hRaw subtree (join +
    // aggregate + join) was evaluated twice per half-step, once under
    // the broadcast max and once in the normalized projection.
    val e0 = Pin.pin(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct(), eager = false)
    val eS = Pin.pinHashed(Pin.fresh(e0), Seq("src"), eager = false)
    val eD = Pin.pinHashed(Pin.fresh(e0), Seq("dst"), eager = false)
    val v = Pin.pinHashed(e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct(), Seq("node"),
      eager = false)

    var hubs = Pin.pinKeep(v.withColumn("h", lit(1.0)), eager = false)
    var auths = v.withColumn("a", lit(1.0))
    for (_ <- 1 to iters) {
      // a(v) = Σ h(u) over u→v, then divide by max(a).
      val aRaw = Pin.pinKeep(v.join(
          eS.join(hubs.select(col("node").as("src"), col("h")), Seq("src"))
            .groupBy(col("dst").as("node")).agg(sum(col("h")).as("s")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0.0)).as("a")),
        eager = false)
      val aMax = aRaw.agg(max(col("a")).as("m"))
      auths = aRaw.crossJoin(broadcast(aMax))
        .select(col("node"), (col("a") / col("m")).as("a"))
      // h(u) = Σ a(v) over u→v, then divide by max(h).
      val hRaw = Pin.pinKeep(v.join(
          eD.join(auths.select(col("node").as("dst"), col("a")), Seq("dst"))
            .groupBy(col("src").as("node")).agg(sum(col("a")).as("s")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0.0)).as("h")),
        eager = false)
      val hMax = hRaw.agg(max(col("h")).as("m"))
      hubs = hRaw.crossJoin(broadcast(hMax))
        .select(col("node"), (col("h") / col("m")).as("h"))
    }
    hubs.join(auths, Seq("node"))
      .select(col("node"), round(col("h"), 8).as("hub"),
        round(col("a"), 8).as("authority"))
  }
}
