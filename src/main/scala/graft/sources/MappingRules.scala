package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curated mapping-rules source (reference S10,
  * `etl/workflow/readers/mapping_rules_reader.py:41-104`): JSON files of
  * harmonisation decisions — e.g. for diagnosis, the composite key
  * (data_source, diagnosis, primary_site, tumour_type) → mapped ontology
  * term. The reference parses driver-side; here the file is read as
  * multiline JSON and the rules array exploded in-plan, keeping the
  * (small) rules table an ordinary broadcastable DataFrame.
  *
  * Expected shape:
  * {{{
  * { "mappings": [ { "data_source": "...", "diagnosis": "...",
  *                   "primary_site": "...", "tumour_type": "...",
  *                   "mapped_term_id": "NCIT:C...", "decision": "..." } ] }
  * }}}
  */
object MappingRules {

  def readDiagnosisRules(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiline", "true").json(path)
      .select(explode(col("mappings")).as("m"))
      .select(
        lower(trim(col("m.data_source"))).as("data_source"),
        lower(trim(col("m.diagnosis"))).as("diagnosis"),
        lower(trim(col("m.primary_site"))).as("primary_site"),
        lower(trim(col("m.tumour_type"))).as("tumour_type"),
        col("m.mapped_term_id").as("mapped_term_id"))

  /** Apply diagnosis rules to samples on the reference's 4-part key
    * (`sample_to_ontology_transformer_job.py:120-139`); comparisons are
    * case-insensitive like the reference's lower-cased mapping keys.
    * Rules broadcast (they are curated, small); left join keeps unmapped
    * samples for review.
    */
  def mapSamples(
      samples: DataFrame,
      rules: DataFrame,
      dataSource: String = "data_source",
      diagnosis: String = "diagnosis",
      primarySite: String = "primary_site",
      tumourType: String = "tumour_type"): DataFrame = {
    val r = broadcast(rules)
    val cond =
      lower(trim(samples(dataSource))) === r("data_source") &&
        lower(trim(samples(diagnosis))) === r("diagnosis") &&
        lower(trim(samples(primarySite))) === r("primary_site") &&
        lower(trim(samples(tumourType))) === r("tumour_type")
    samples.join(r, cond, "left")
      .drop(r("data_source")).drop(r("diagnosis"))
      .drop(r("primary_site")).drop(r("tumour_type"))
  }
}
