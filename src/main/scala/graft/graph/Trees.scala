package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nested relationship trees and reachable subgraphs over a
  * single-parent hierarchy — the distributed re-expression of the
  * reference's recursive SQL surface: `pdcm_api.get_parents_tree` /
  * `get_children_tree` (`scripts/init.sql:1175-1203`), the
  * `model_relationships` / `has_relations` columns they populate
  * (`scripts/updates.sql:1-39`), and `get_knowledge_graph`'s
  * reachable-subgraph JSON (`scripts/updates.sql:81-150`).
  *
  * The reference computes each tree with a correlated recursive function
  * PER MODEL — N recursive query executions against Postgres. Here every
  * round is ONE join resolving a whole tree LEVEL for all models at
  * once, so total work is O(edges × depth) with ⌈depth⌉ rounds of fixed
  * scheduling cost, independent of model count — the shape that survives
  * a 100M-model table. Model lineage trees are shallow (patient → PDX →
  * derived models, depth ≤ ~5), so the round count is tiny.
  *
  * JSON is assembled with plain string concatenation (key order and
  * spacing fixed, children sorted by id), NOT `to_json`, so the result
  * is a pure deterministic function of the input — replayable in any
  * engine (the oracle builds byte-identical strings in SQL).
  */
object Trees {

  private def pin(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.Pin.pin(df)

  private def fresh(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.Pin.fresh(df)

  /** One pinned, normalized (id, mtype, pid, scp) frame — the shared
    * base of both tree sweeps, so `modelRelationships` scans and pins
    * the model table ONCE instead of once per sweep. `scp` is the
    * lineage SCOPE (r12: the data_source — external model ids are only
    * unique per provider, so every id join must carry it; the volume
    * drill's first find was provider-colliding ids silently merging
    * trees); `scopeCol = None` pins it to "" — byte-identical to the
    * unscoped behavior.
    */
  private def normalized(
      models: DataFrame, idCol: String, typeCol: String, parentCol: String,
      scopeCol: Option[String]): DataFrame =
    pin(models.select(
      col(idCol).cast("string").as("id"),
      col(typeCol).cast("string").as("mtype"),
      col(parentCol).cast("string").as("pid"),
      scopeCol.map(c => col(c).cast("string")).getOrElse(lit("")).as("scp")))

  /** Per-model nested PARENTS tree as a JSON string column
    * (`external_model_id`, `parents_json`): for a model with parent P,
    * `[{"external_model_id":"P","type":…,"parents":<P's tree>}]`; null
    * for roots and for parent ids that don't resolve (same semantics as
    * the reference's join in `get_parents_tree` — a dangling parent_id
    * contributes nothing).
    *
    * Resolution sweeps DOWN from the roots: round k resolves every model
    * at depth k, so rounds = hierarchy depth regardless of model count.
    * Cycles never resolve and fall out as null after `maxRounds`.
    */
  def parentsTree(
      models: DataFrame, idCol: String, typeCol: String, parentCol: String,
      maxRounds: Int = 32): DataFrame =
    parentsTreeFrom(normalized(models, idCol, typeCol, parentCol, None), maxRounds)
      .select(col("id").as(idCol), col("parents_json"))

  private def parentsTreeFrom(m: DataFrame, maxRounds: Int): DataFrame = {
    // Roots: no parent, or a parent id that matches no model IN SCOPE
    // (the reference's inner join drops those rows, leaving an empty
    // agg; ids resolve within their data_source only).
    val withParent = m.as("c").join(
      m.select(col("id").as("pp_id"), col("scp").as("pp_scp")).as("p"),
      col("pid") === col("pp_id") && col("scp") === col("pp_scp"), "left")
      .select(col("id"), col("mtype"), col("pid"), col("scp"),
        col("pp_id").isNotNull.as("linked"))
    val roots = pin(withParent.filter(!col("linked"))
      .select(col("id"), col("mtype"), col("scp"),
        lit(null).cast("string").as("parents_json")))
    val linked = pin(withParent.filter(col("linked"))
      .select(col("id"), col("mtype"), col("pid"), col("scp")))
    // Single parent per model ⇒ each model resolves EXACTLY once, when
    // its parent's frontier round fires — plain BFS, no pending set, no
    // anti-join, one hash join + one checkpoint + one isEmpty per level.
    // Cycle members (and their descendants) are never reached and fall
    // out as null through the final left join.
    var frontier = roots
    var resolvedDfs = List(roots) // pinned per-level deltas, union is free
    var round = 0
    var more = true
    while (round < maxRounds && more) {
      val pr = frontier.select(col("id").as("r_pid"), col("scp").as("r_scp"),
        col("mtype").as("r_ptype"), col("parents_json").as("r_pjson"))
      val step = pin(linked.join(pr,
          col("pid") === col("r_pid") && col("scp") === col("r_scp"))
        .select(col("id"), col("mtype"), col("scp"),
          concat(lit("["),
            concat(lit("{\"external_model_id\":\""), col("r_pid"),
              lit("\",\"type\":\""), col("r_ptype"),
              lit("\",\"parents\":"), coalesce(col("r_pjson"), lit("null")),
              lit("}")),
            lit("]")).as("parents_json")))
      more = !step.isEmpty // the one action per level; materializes the pin
      if (more) resolvedDfs ::= step
      frontier = step
      round += 1
    }
    val resolved = resolvedDfs.map(fresh).reduce(_.unionAll(_))
    m.join(resolved.select(col("id"), col("scp"), col("parents_json")),
        Seq("id", "scp"), "left")
      .select(col("id"), col("scp"), col("parents_json"))
  }

  /** Per-model nested CHILDREN tree as a JSON string column
    * (`external_model_id`, `children_json`): entries sorted by child id,
    * each wrapping the child's own subtree; null for leaves.
    *
    * Resolution sweeps UP from the leaves: a model resolves once ALL its
    * children have (round k resolves subtree-height-k nodes), so rounds
    * = hierarchy height. The per-round work is one aggregation over the
    * edges whose child side is fully resolved — map-side combinable,
    * skew-bounded by real fan-out.
    */
  def childrenTree(
      models: DataFrame, idCol: String, typeCol: String, parentCol: String,
      maxRounds: Int = 32): DataFrame =
    childrenTreeFrom(normalized(models, idCol, typeCol, parentCol, None), maxRounds)
      .select(col("id").as(idCol), col("children_json"))

  private def childrenTreeFrom(m: DataFrame, maxRounds: Int): DataFrame = {
    val ids = m.select(col("id").as("known_id"), col("scp").as("known_scp"))
    // Child edges whose parent actually exists IN SCOPE (dangling
    // parent_id rows are nobody's children, mirroring the reference's
    // join; ids resolve within their data_source only).
    val edges = pin(m.filter(col("pid").isNotNull)
      .join(ids, col("pid") === col("known_id") && col("scp") === col("known_scp"))
      .select(col("pid").as("parent"), col("id").as("child"),
        col("mtype").as("ctype"), col("scp")))
    val childCounts = edges.groupBy(col("parent"), col("scp"))
      .agg(count(lit(1)).as("n_children"))
    // `resolved` accumulates as the free RDD union of pinned per-round
    // steps (the Closure pattern) — re-pinning the whole resolved set
    // every round rewrites O(models) blocks per level.
    val leaves = pin(m.join(
        childCounts.select(col("parent").as("id"), col("scp")),
        Seq("id", "scp"), "left_anti")
      .select(col("id"), col("scp"), lit(null).cast("string").as("children_json")))
    var resolvedDfs = List(leaves) // pinned per-level deltas, union free
    def resolved: DataFrame = resolvedDfs.map(fresh).reduce(_.unionAll(_))
    var pending = pin(m.join(childCounts,
        m("id") === childCounts("parent") && m("scp") === childCounts("scp"))
      .select(m("id"), m("scp"), col("n_children")))
    var round = 0
    while (round < maxRounds && !pending.isEmpty) {
      // A pending parent resolves when every child is in `resolved`:
      // count(resolved children) == n_children. Entries sort by child id
      // so the array order is deterministic in any engine.
      val rc = resolved.select(col("id").as("r_id"), col("scp").as("r_scp"),
        col("children_json").as("r_json"))
      val done = edges.join(rc,
          col("child") === col("r_id") && col("scp") === col("r_scp"))
        .select(col("parent"), col("child"), col("ctype"), col("scp"), col("r_json"))
        .groupBy(col("parent"), col("scp"))
        .agg(count(lit(1)).as("n_resolved"),
          concat(lit("["),
            array_join(transform(
              array_sort(collect_list(struct(col("child"), col("ctype"), col("r_json")))),
              e => concat(lit("{\"external_model_id\":\""), e("child"),
                lit("\",\"type\":\""), e("ctype"),
                lit("\",\"children\":"), coalesce(e("r_json"), lit("null")),
                lit("}"))), ","),
            lit("]")).as("children_json"))
      val step = pin(pending.join(done,
          pending("id") === done("parent") && pending("scp") === done("scp") &&
            col("n_resolved") === col("n_children"))
        .select(pending("id"), pending("scp"), col("children_json")))
      if (step.isEmpty) round = maxRounds // cycle remainder: bail
      else {
        pending = pin(pending.join(step.select(col("id"), col("scp")),
          Seq("id", "scp"), "left_anti"))
        resolvedDfs ::= step
        round += 1
      }
    }
    resolved.union(pending.select(col("id"), col("scp"),
        lit(null).cast("string").as("children_json")))
      .select(col("id"), col("scp"), col("children_json"))
  }

  /** `model_relationships` + `has_relations` for every model
    * (`scripts/updates.sql:1-39`): one JSON object
    * `{"parents":…,"children":…}` and the derived boolean.
    */
  def modelRelationships(
      models: DataFrame, idCol: String, typeCol: String, parentCol: String,
      scopeCol: Option[String] = None): DataFrame = {
    // One shared pinned base: both sweeps read the same materialized
    // (id, mtype, pid, scp) blocks instead of each re-scanning +
    // re-pinning the model table. scopeCol (r12): external model ids
    // are provider-local — pass the data_source so trees never span
    // providers (the volume drill caught cross-provider id collisions
    // silently merging lineages).
    val m = normalized(models, idCol, typeCol, parentCol, scopeCol)
    val p = parentsTreeFrom(m, 32)
    val c = childrenTreeFrom(m, 32)
    val base = p.join(c, Seq("id", "scp"))
      .select(col("id").as(idCol), col("scp"),
        concat(lit("{\"parents\":"), coalesce(col("parents_json"), lit("null")),
          lit(",\"children\":"), coalesce(col("children_json"), lit("null")),
          lit("}")).as("model_relationships"),
        (col("parents_json").isNotNull || col("children_json").isNotNull)
          .as("has_relations"))
    scopeCol match {
      case Some(sc) => base.withColumnRenamed("scp", sc)
      case None     => base.drop("scp")
    }
  }

  /** Edges reachable FROM each root by following `src → dst` — the
    * distributed form of `get_knowledge_graph`'s recursive CTE
    * (`scripts/updates.sql:107-117`), all roots expanded at once.
    * Returns (root, src, dst, label). Frontier iteration with the seen
    * set anti-joined out per round (cycle-safe); rounds = graph depth.
    */
  def reachableEdges(
      edges: DataFrame, roots: DataFrame, rootCol: String,
      maxRounds: Int = 32): DataFrame = {
    val e = pin(edges.select(col("src"), col("dst"), col("label")))
    val r0 = roots.select(col(rootCol).as("root"))
    var frontier = pin(r0.join(e, col("root") === col("src"))
      .select(col("root"), col("src"), col("dst"), col("label")))
    // Accumulator as the free union of already-pinned per-round DELTAS
    // (the Closure.transitiveClosure pattern): re-checkpointing the
    // whole accumulated set every round rewrites O(reachable) blocks
    // per level for nothing.
    var deltas = List(frontier)
    def acc: DataFrame = deltas.map(fresh).reduce(_.unionAll(_))
    var round = 0
    while (round < maxRounds && !frontier.isEmpty) {
      val f = frontier.select(col("root").as("f_root"), col("dst").as("f_dst"))
        .dropDuplicates()
      val next = pin(f.join(e, col("f_dst") === col("src"))
        .select(col("f_root").as("root"), col("src"), col("dst"), col("label"))
        .dropDuplicates()
        .join(acc, Seq("root", "src", "dst", "label"), "left_anti"))
      frontier = next
      if (!next.isEmpty) deltas ::= next
      round += 1
    }
    acc
  }

  /** Per-root knowledge-graph JSON `{"nodes":[…],"edges":[…]}` over a
    * typed node table, nodes and edges sorted for determinism — the
    * assembly half of `get_knowledge_graph` (`scripts/updates.sql:
    * 118-137`), one row per root instead of one Postgres temp-table
    * dance per call.
    */
  def knowledgeGraph(
      nodes: DataFrame, edges: DataFrame, roots: DataFrame, rootCol: String): DataFrame = {
    val reach = reachableEdges(edges, roots, rootCol)
    val edgeJson = reach.groupBy(col("root"))
      .agg(concat(lit("["),
        array_join(transform(
          array_sort(collect_list(struct(col("src"), col("dst"), col("label")))),
          e => concat(lit("{\"source\":"), e("src"), lit(",\"target\":"), e("dst"),
            lit(",\"label\":\""), e("label"), lit("\"}"))), ","),
        lit("]")).as("edges_json"))
    val member = reach.select(col("root"), col("src").as("node_id"))
      .union(reach.select(col("root"), col("dst").as("node_id")))
      .dropDuplicates()
    val n = nodes.select(col("node_id").as("n_id"), col("node_type"), col("data"))
    val nodeJson = member.join(n, col("node_id") === col("n_id"))
      .groupBy(col("root"))
      .agg(concat(lit("["),
        array_join(transform(
          array_sort(collect_list(struct(col("node_id"), col("node_type"), col("data")))),
          e => concat(lit("{\"id\":"), e("node_id"),
            lit(",\"node_type\":\""), e("node_type"),
            lit("\",\"data\":"), e("data"), lit("}"))), ","),
        lit("]")).as("nodes_json"))
    nodeJson.join(edgeJson, Seq("root"))
      .select(col("root"),
        concat(lit("{\"nodes\":"), col("nodes_json"),
          lit(",\"edges\":"), col("edges_json"), lit("}")).as("knowledge_graph"))
  }
}
