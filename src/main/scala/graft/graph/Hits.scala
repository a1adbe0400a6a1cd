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
    def pin(df: DataFrame): DataFrame =
      org.apache.spark.sql.graft.Pin.pin(df)

    val e = pin(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    val v = pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())

    var hubs = pin(v.withColumn("h", lit(1.0)))
    var auths = v.withColumn("a", lit(1.0))
    for (_ <- 1 to iters) {
      // a(v) = Σ h(u) over u→v, then divide by max(a).
      val aRaw = v.join(
          e.join(hubs.select(col("node").as("src"), col("h")), Seq("src"))
            .groupBy(col("dst").as("node")).agg(sum(col("h")).as("s")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0.0)).as("a"))
      val aMax = aRaw.agg(max(col("a")).as("m"))
      auths = pin(aRaw.crossJoin(broadcast(aMax))
        .select(col("node"), (col("a") / col("m")).as("a")))
      // h(u) = Σ a(v) over u→v, then divide by max(h).
      val hRaw = v.join(
          e.join(auths.select(col("node").as("dst"), col("a")), Seq("dst"))
            .groupBy(col("src").as("node")).agg(sum(col("a")).as("s")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0.0)).as("h"))
      val hMax = hRaw.agg(max(col("h")).as("m"))
      hubs = pin(hRaw.crossJoin(broadcast(hMax))
        .select(col("node"), (col("h") / col("m")).as("h")))
    }
    hubs.join(auths, Seq("node"))
      .select(col("node"), round(col("h"), 8).as("hub"),
        round(col("a"), 8).as("authority"))
  }
}
