package graft.graph

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Obo.OboTerm

/** Driver-side ontology DAG (reference §2.10,
  * `etl/jobs/util/graph_builder.py:7-163`): parent→child edges from OBO
  * `is_a` relations, BFS ancestors/descendants, top-level-term subgraph
  * extraction, and the Malignant/Neoplasm→Cancer display rename.
  *
  * The NCIt graph is ~150k edges — orders of magnitude below anything
  * worth distributing. It lives on the driver as adjacency maps and its
  * DERIVED tables (term lists, ancestor closures) become DataFrames that
  * broadcast-join against the 100 TB fact side.
  */
final class OntologyGraph private (
    val names: Map[String, String],
    childrenOf: Map[String, Seq[String]],
    parentsOf: Map[String, Seq[String]]
) {

  private def reach(start: String, next: Map[String, Seq[String]]): Set[String] = {
    val seen = mutable.Set.empty[String]
    val queue = mutable.Queue(next.getOrElse(start, Nil): _*)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      if (seen.add(n)) queue.enqueueAll(next.getOrElse(n, Nil))
    }
    seen.toSet
  }

  /** All transitive ancestors (is_a targets) of `termId`. */
  def ancestors(termId: String): Set[String] = reach(termId, parentsOf)

  /** All transitive descendants of `termId`. */
  def descendants(termId: String): Set[String] = reach(termId, childrenOf)

  /** Terms reachable from any of `topLevelTerms` (the reference's
    * branch-subgraph extraction, `graph_builder.py:103-124`).
    */
  def subgraphTerms(topLevelTerms: Seq[String]): Set[String] =
    topLevelTerms.flatMap(descendants).toSet

  /** Induced subgraph on the descendants of `roots` (the roots themselves
    * excluded — mirrors `nx.descendants` + `nx.subgraph` in the
    * reference's `extract_subgraph_from_graph`, `graph_builder.py:47-49`,
    * composed over the branch's top-level terms,
    * `extract_graph_by_ontology_id`, `graph_builder.py:103-124`).
    */
  def branch(roots: Seq[String]): OntologyGraph = {
    val keep = subgraphTerms(roots)
    new OntologyGraph(
      names.filter { case (k, _) => keep(k) },
      childrenOf.collect { case (k, v) if keep(k) => k -> v.filter(keep) },
      parentsOf.collect { case (k, v) if keep(k) => k -> v.filter(keep) })
  }

  /** Term ids in this graph (sorted for determinism). */
  def termIds: Seq[String] = names.keys.toSeq.sorted

  /** term_id → pipe-joined ancestor NAMES (reference
    * `create_term_ancestors`, `graph_builder.py:151-163`).
    */
  def termAncestorsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    names.keys.toSeq.sorted
      .map(id => (id, ancestors(id).toSeq.flatMap(names.get).sorted.mkString("|")))
      .toDF("term_id", "ancestors")
  }
}

object OntologyGraph {

  def fromTerms(terms: Seq[OboTerm]): OntologyGraph = {
    val names = terms.map(t => t.term_id -> t.term_name).toMap
    val parentEdges = terms.flatMap(t => t.is_a.map(p => t.term_id -> p))
    val parentsOf = parentEdges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val childrenOf = parentEdges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
    new OntologyGraph(names, childrenOf, parentsOf)
  }

  /** Display rename (reference `update_term_name`,
    * `graph_builder.py:127-135`): "… Malignant … Neoplasm …" →
    * "… … Cancer …", else "… Neoplasm …" → "… Cancer …", then squeeze
    * whitespace.
    */
  def updateTermName(termName: String): String = {
    val renamed =
      if (termName.contains("Malignant"))
        termName.replaceAll("(.*)Malignant(.*)Neoplasm(.*)", "$1$2Cancer$3").trim
      else
        termName.replaceAll("(.*)Neoplasm(.*)", "$1Cancer$2").trim
    renamed.replaceAll("\\s+", " ").trim
  }
}
