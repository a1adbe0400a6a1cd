package graft.pdcm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-resource link generation (reference
  * `etl/jobs/transformation/links_generation/` + S12/S16, SURVEY §2.8):
  * URL templates expanded with column values, id-pattern extraction for
  * known registries, and the one-row release-info table.
  */
object Links {

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
