package graft.pdcm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-resource link generation (reference
  * `etl/jobs/transformation/links_generation/` + S12/S16, SURVEY §2.8):
  * URL templates expanded with column values, id-pattern extraction for
  * known registries, and the one-row release-info table.
  */
object Links {

  /** JSON string literal from a column: null → "", backslashes and double
    * quotes escaped. For composing JSON objects that must SPLICE
    * already-serialized JSON fragments (where `to_json(struct(...))`
    * would double-escape them); free text with quotes stays valid JSON.
    */
  def jsonStr(c: Column): Column =
    concat(lit("\""),
      regexp_replace(
        regexp_replace(coalesce(c, lit("")), "\\\\", "\\\\\\\\"),
        "\"", "\\\\\""),
      lit("\""))

  /** Expand a URL template by replacing `token` with the column value
    * (reference `molecular_data_links_builder.py:124,141` uses
    * `expr("regexp_replace(link, 'TOKEN', col)")`; in Scala no expr()
    * detour is needed — and the replacement is literal, not regex).
    */
  def expandTemplate(template: String, token: String, value: Column): Column =
    replace(lit(template), lit(token), value)

  /** Known external-id patterns → resource links (reference
    * `model_ids_links.py:73-174`: DepMap `ACH-…`, Cellosaurus `CVCL_…`,
    * COSMIC / rs-ids in molecular data). Returns (resource, link) columns
    * as a map over the first matching pattern; null when nothing matches.
    */
  final case class IdPattern(resource: String, pattern: String, template: String)

  val defaultPatterns: Seq[IdPattern] = Seq(
    IdPattern("DepMap", "(ACH-[0-9]+)",
      "https://depmap.org/portal/cell_line/TOKEN"),
    IdPattern("Cellosaurus", "(CVCL_[0-9A-Za-z]+)",
      "https://www.cellosaurus.org/TOKEN"),
    IdPattern("dbSNP", "(rs[0-9]+)",
      "https://www.ncbi.nlm.nih.gov/snp/TOKEN"))

  /** Attach (resource, link) for the FIRST pattern matching `idCol`;
    * unmatched rows get nulls. Pure when-chain — codegen'd, no UDF.
    */
  def resolveIdLinks(
      df: DataFrame,
      idCol: String,
      patterns: Seq[IdPattern] = defaultPatterns): DataFrame = {
    val extracted = patterns.map { p =>
      (p, regexp_extract(col(idCol), p.pattern, 1))
    }
    val resource = extracted.foldRight(lit(null).cast("string")) {
      case ((p, ex), acc) => when(ex =!= "", lit(p.resource)).otherwise(acc)
    }
    val link = extracted.foldRight(lit(null).cast("string")) {
      case ((p, ex), acc) =>
        when(ex =!= "", expandTemplate(p.template, "TOKEN", ex)).otherwise(acc)
    }
    df.withColumn("resource", resource).withColumn("link", link)
  }

  /** Offline treatment→ChEMBL resolution (reference risk #4: the original
    * calls the EBI REST API from inside a UDF,
    * `treatments_links_builder.py:59-113` — a network-in-UDF anti-pattern
    * that is neither hermetic nor retry-safe). Here the resolver is a
    * lookup TABLE (pre-fetched offline / cached) broadcast-joined against
    * the distinct treatment names; the expensive externality is batched
    * once, outside the data path.
    */
  def chemblLinks(
      treatments: DataFrame,
      nameCol: String,
      chemblLookup: DataFrame, // columns: name, chembl_id
      template: String = "https://www.ebi.ac.uk/chembl/compound_report_card/TOKEN"): DataFrame = {
    val lookup = broadcast(
      chemblLookup.select(lower(trim(col("name"))).as("__chembl_name"), col("chembl_id")))
    treatments
      .join(lookup, lower(trim(col(nameCol))) === col("__chembl_name"), "left")
      .drop("__chembl_name")
      .withColumn("chembl_link",
        when(col("chembl_id").isNotNull,
          expandTemplate(template, "TOKEN", col("chembl_id"))))
  }

  /** Breast-cancer gene display names (reference `gene_display_map` UDF,
    * `search_index_molecular_data_transformer_job.py:191-196`) as a pure
    * map-literal lookup — no UDF.
    */
  val BreastGeneDisplay: Map[String, String] =
    Map("ERBB2" -> "HER2/ERBB2", "ESR1" -> "ER/ESR1", "PGR" -> "PR/PGR")

  def displayBreastGene(gene: Column): Column =
    coalesce(element_at(typedLit(BreastGeneDisplay), gene), gene)

  /** Display rename of ontology term names as a COLUMN expression
    * ("… Malignant … Neoplasm …" → "… … Cancer …", else "Neoplasm" →
    * "Cancer", then whitespace squeeze) — the in-plan form of
    * [[graft.graph.OntologyGraph.updateTermName]] (reference
    * `update_term_name`, `graph_builder.py:127-135`).
    */
  def displayTermName(c: Column): Column =
    trim(regexp_replace(
      when(c.contains("Malignant"),
        regexp_replace(c, "(.*)Malignant(.*)Neoplasm(.*)", "$1$2Cancer$3"))
        .otherwise(regexp_replace(c, "(.*)Neoplasm(.*)", "$1Cancer$2")),
      "\\s+", " "))

  /** Treatment-type classification (reference `calculate_type` UDF,
    * `treatment_type_helper_transformer_job.py:33-87`): a treatment's
    * types are every category whose keyword list matches ANY of its
    * ontology-ancestor names. Pure higher-order expression (exists over
    * the ancestors array) — no UDF; `Seq()` result means unclassified.
    */
  def classifyTreatmentTypes(
      ancestors: Column,
      typeKeywords: Seq[(String, Seq[String])]): Column = {
    val matched = typeKeywords.map { case (tpe, kws) =>
      when(
        exists(ancestors, a =>
          kws.map(kw => lower(a).contains(kw.toLowerCase)).reduce(_ || _)),
        lit(tpe))
    }
    filter(array(matched: _*), _.isNotNull)
  }

  /** One-row release-info table (reference `etl/workflow/reporter.py:24-49`,
    * S16): name, date, provider list.
    */
  def releaseInfo(
      spark: SparkSession,
      name: String,
      providers: Seq[String]): DataFrame = {
    import spark.implicits._
    Seq((name, providers))
      .toDF("name", "providers")
      .withColumn("date", current_date())
      .select("name", "date", "providers")
  }
}
