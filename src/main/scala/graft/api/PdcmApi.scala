package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `pdcm_api` view surface over the ENTITY DAG — the Spark analog of
  * the reference's Postgres view layer (`scripts/views.sql:66-1200`),
  * served natively: entity DataFrames register as temp views and the API
  * views are declarative SQL over them, so Catalyst folds a user query
  * straight through to the entity plans (predicate pushdown reaches the
  * underlying scans; a "materialized" reference view is just an entity
  * the runner persisted).
  *
  * View names carry the `pdcm_api_` prefix (temp views have no schema
  * qualifier).
  */
object PdcmApi {

  /** SQL per derived view (reference views.sql line cited). */
  private val viewSql: Seq[(String, String)] = Seq(
    // model_information (views.sql:66): model + specimen FK row.
    "model_information" ->
      """SELECT m.id, m.model_id AS external_model_id,
         m.data_source, m.sample_type, m.accessibility,
         m.license, s.host_strain_id, s.engraftment_site_id,
         s.engraftment_type_id, s.passage_number
         FROM model_entity m
         LEFT JOIN xenograft_model_specimen s ON m.id = s.model_fk""",
    // model_quality_assurance (views.sql:189).
    "model_quality_assurance" ->
      """SELECT model_id, data_source, validation_json
         FROM quality_assurance""",
    // mutation_data_table (views.sql:363): harmonised-or-raw symbol plus
    // the provider/table restriction filter.
    "mutation_data_table" ->
      """SELECT molchar_id AS molecular_characterization_id,
         COALESCE(harmonized_symbol, symbol) AS hgnc_symbol,
         symbol AS non_harmonised_symbol, amino_acid_change, chromosome,
         strand, consequence, read_depth, allele_frequency,
         seq_start_position, ref_allele, alt_allele, biotype,
         match_stage AS harmonisation_result,
         data_source
         FROM mutation_data
         WHERE (data_source, 'mutation_measurement_data') NOT IN
           (SELECT data_source, molecular_data_table
            FROM molecular_data_restriction)""",
    // expression_data_table (views.sql:496).
    "expression_data_table" ->
      """SELECT molchar_id AS molecular_characterization_id,
         COALESCE(harmonized_symbol, symbol) AS hgnc_symbol,
         symbol AS non_harmonised_symbol, chromosome, strand,
         seq_start_position, seq_end_position, rnaseq_coverage,
         rnaseq_fpkm, rnaseq_tpm, rnaseq_count,
         data_source
         FROM expression_data
         WHERE (data_source, 'expression_molecular_data') NOT IN
           (SELECT data_source, molecular_data_table
            FROM molecular_data_restriction)""",
    // cna_data_table (views.sql:705).
    "cna_data_table" ->
      """SELECT molchar_id AS molecular_characterization_id,
         COALESCE(harmonized_symbol, symbol) AS hgnc_symbol,
         symbol AS non_harmonised_symbol, chromosome, strand,
         seq_start_position, seq_end_position, log10r_cna, log2r_cna,
         copy_number_status, gistic_value,
         data_source
         FROM cna_data
         WHERE (data_source, 'cna_molecular_data') NOT IN
           (SELECT data_source, molecular_data_table
            FROM molecular_data_restriction)""",
    // biomarker_data_table (views.sql:588).
    "biomarker_data_table" ->
      """SELECT molchar_id AS molecular_characterization_id,
         COALESCE(harmonized_symbol, symbol) AS hgnc_symbol,
         symbol AS non_harmonised_symbol, biomarker_status,
         data_source
         FROM biomarker_data
         WHERE (data_source, 'biomarker_molecular_data') NOT IN
           (SELECT data_source, molecular_data_table
            FROM molecular_data_restriction)""",
    // immunemarker_data_table (views.sql:655).
    "immunemarker_data_table" ->
      """SELECT molchar_id AS molecular_characterization_id, marker_type,
         marker_name, marker_value, essential_or_additional_details,
         data_source
         FROM immunemarker_data
         WHERE (data_source, 'immunemarker_molecular_data') NOT IN
           (SELECT data_source, molecular_data_table
            FROM molecular_data_restriction)""",
    // model_molecular_metadata (views.sql:406, materialized there — here
    // a plain view; persist the molchar entity for the same effect).
    "model_molecular_metadata" ->
      """SELECT id AS molecular_characterization_id, sample_origin,
         platform_id, molecular_characterisation_type, patient_sample_id,
         xenograft_sample_id, cell_sample_id,
         data_source
         FROM molecular_characterization""",
    // models_by_cancer (views.sql:1097).
    "models_by_cancer" ->
      """SELECT cancer_system, histology, count(*) AS count
         FROM search_index GROUP BY cancer_system, histology""",
    // models_by_mutated_gene (views.sql:1113).
    "models_by_mutated_gene" ->
      """SELECT split_part(gene, '/', 1) AS mutated_gene,
         count(DISTINCT pdcm_model_id) AS count
         FROM (SELECT explode(markers_with_mutation_data) AS gene,
                 pdcm_model_id FROM search_index)
         GROUP BY split_part(gene, '/', 1)""",
    // models_by_dataset_availability (views.sql:1128).
    "models_by_dataset_availability" ->
      """SELECT dataset_availability, count(DISTINCT pdcm_model_id) AS count
         FROM (SELECT explode(dataset_available) AS dataset_availability,
                 pdcm_model_id FROM search_index)
         GROUP BY dataset_availability""",
    // dosing_studies / patient_treatment (views.sql:1142, :1192).
    "dosing_studies" ->
      """SELECT model_id, explode(model_treatments) AS treatment
         FROM treatment_by_model WHERE model_treatments IS NOT NULL""",
    "patient_treatment" ->
      """SELECT model_id, explode(patient_treatments) AS treatment
         FROM treatment_by_model WHERE patient_treatments IS NOT NULL""",
    // provider_group / project_group (views.sql:967, :984).
    "provider_group_vw" ->
      """SELECT id, name, provider_abbreviation, provider_description,
         provider_type_id, project_group_id, data_source
         FROM provider_group""",
    "project_group_vw" -> "SELECT id, name FROM project_group",
    // contact_people (views.sql:229).
    "contact_people_vw" ->
      "SELECT id, name_list, email_list, data_source FROM contact_people",
    // cell_model (views.sql:997).
    "cell_model_vw" ->
      """SELECT id, model_fk, model_id AS external_model_id, model_name,
         model_name_aliases, type, growth_properties, growth_media,
         media_id, plate_coating, data_source
         FROM cell_model""",
    // publication_group (views.sql:352).
    "publication_group_vw" -> "SELECT id, pubmed_ids FROM publication_group",
    // Dim passthroughs (views.sql:264-337).
    "engraftment_site_vw" -> "SELECT id, name FROM engraftment_site",
    "engraftment_type_vw" -> "SELECT id, name FROM engraftment_type",
    "host_strain_vw" -> "SELECT id, name FROM host_strain",
    // search surface passthroughs (views.sql:816, :932, :1028).
    "search_index_vw" -> "SELECT * FROM search_index",
    "search_facet_vw" -> "SELECT * FROM search_facet",
    "available_molecular_data_columns_vw" ->
      "SELECT * FROM available_molecular_data_columns")

  /** Register the entity DataFrames as temp views plus every derived
    * `pdcm_api_<name>` view. An entity map may supply
    * `molecular_data_restriction`; otherwise an empty restriction table
    * is registered (nothing filtered). Returns the derived view names.
    */
  def register(
      spark: SparkSession,
      entities: Map[String, DataFrame]): Seq[String] = {
    entities.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    if (!entities.contains("molecular_data_restriction"))
      spark.sql(
        """SELECT CAST(null AS STRING) AS data_source,
           CAST(null AS STRING) AS molecular_data_table WHERE 1 = 0""")
        .createOrReplaceTempView("molecular_data_restriction")
    viewSql.map { case (name, sql) =>
      val viewName = s"pdcm_api_$name"
      spark.sql(s"CREATE OR REPLACE TEMP VIEW $viewName AS $sql")
      viewName
    }
  }
}
