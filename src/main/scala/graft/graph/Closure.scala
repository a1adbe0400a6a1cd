package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed transitive closure over a (child, parent) edge table —
  * the scale path for ancestor/descendant closures when the graph itself
  * is fact-sized (the driver-side [[OntologyGraph]] covers the ~150k-term
  * ontology case; this covers lineage graphs that grow with the data,
  * e.g. the reference's patient→sample→model `edges` table at
  * `etl/jobs/transformation/edges_transformer_job.py:57-89` applied to
  * millions of models).
  *
  * Semi-naive iteration: each round joins only the NEW pairs (frontier)
  * against the base edges, so total work is O(|closure|) join probes, not
  * O(rounds × |closure|). Rounds = graph depth; each round is one hash
  * join + one distinct — both partition by key, no driver data. Lineage
  * is truncated every round with `localCheckpoint` (an iterative plan
  * otherwise grows exponentially and re-executes prior rounds).
  */
object Closure {

  /** All (descendant, ancestor) pairs reachable through `edges`.
    * Cycle-safe: already-seen pairs are anti-joined out each round, so a
    * cycle converges to its finite pair set instead of looping.
    */
  def transitiveClosure(
      edges: DataFrame,
      childCol: String,
      parentCol: String,
      maxRounds: Int = 64): DataFrame = {
    val spark = edges.sparkSession
    // Materialize and re-wrap as a FRESH plan: truncates iterative
    // lineage AND gives every round independent attribute/dataset ids —
    // the closure self-joins the same table repeatedly, which otherwise
    // trips Spark's ambiguous-self-join analysis.
    def pin(df: DataFrame): DataFrame =
      spark.createDataFrame(df.localCheckpoint().rdd, df.schema)
    val e = pin(edges
      .select(col(childCol).as("child"), col(parentCol).as("parent"))
      .filter(col("child").isNotNull && col("parent").isNotNull)
      .dropDuplicates())
    var acc = e
    var frontier = e
    var round = 0
    while (round < maxRounds && !frontier.isEmpty) {
      // Frontier side renamed so every column NAME in the joined scope is
      // unique; resolve by name (plain col()), not df("col") — dataset-id
      // resolution flags round 1 (frontier == e) as an ambiguous
      // self-join even though the names are disjoint.
      val f = frontier.select(
        col("child").as("f_child"), col("parent").as("f_parent"))
      val next = pin(f
        .join(e, col("f_parent") === col("child"))
        .select(col("f_child").as("child"), col("parent"))
        .dropDuplicates()
        .join(acc, Seq("child", "parent"), "left_anti"))
      acc = acc.union(next)
      frontier = next
      round += 1
    }
    acc
  }
}
