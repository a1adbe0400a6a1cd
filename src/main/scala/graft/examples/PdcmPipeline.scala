package graft.examples

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Cleaning, Ids}
import graft.operators.Relational
import graft.pipeline.{EntityDef, EntityRegistry, PipelineRunner}
import graft.sources.{Obo, PostgresTsv, Tsv}

/** Entity-DAG demo: the PdcmSlice flow re-expressed as registry entities
  * executed topologically by [[PipelineRunner]] — the in-process
  * replacement for the reference's Luigi DAG + entities registry
  * (`etl/workflow/transformer.py`, `etl/entities_registry.py`). The
  * `diagnosis_term` dim fans out to two consumers and is auto-persisted;
  * `patient_count_helper` is a helper entity (no contract, never sunk).
  *
  * Run: sbt "runMain graft.examples.PdcmPipeline [workDir]"
  */
object PdcmPipeline {

  def registry(): EntityRegistry = new EntityRegistry()
    .register(EntityDef(
      "ethnicity", Seq("raw_patient"),
      (_, in) => in("raw_patient")
        .select(Cleaning.sentinelToNull(col("ethnicity")).as("name"))
        .filter(col("name").isNotNull)
        .distinct()
        .withColumn("id", Ids.hashId(col("name"))),
      outputColumns = Seq("id", "name")))
    .register(EntityDef(
      "diagnosis_term", Seq("ontology_terms"),
      (s, in) => in("ontology_terms")
        .select(col("term_id"), col("term_name"))
        .withColumn("display_name",
          udf(graft.graph.OntologyGraph.updateTermName _).apply(col("term_name"))),
      outputColumns = Seq("term_id", "term_name", "display_name")))
    .register(EntityDef(
      "patient", Seq("raw_patient", "ethnicity", "diagnosis_term"),
      (_, in) => {
        val cleaned = in("raw_patient")
          .withColumn("sex", initcap(Cleaning.trimAll(col("sex"))))
          .withColumn("ethnicity", Cleaning.sentinelToNull(col("ethnicity")))
          .dropDuplicates("patient_id", Tsv.ProvenanceCol)
          .withColumn("id", Ids.hashId(col("patient_id"), col(Tsv.ProvenanceCol)))
        val withEth = Relational.transformToFk(
          cleaned, in("ethnicity"), "ethnicity", "name", "id", "ethnicity_id")
        Relational.transformToFk(
          withEth, in("diagnosis_term"), "diagnosis", "term_name", "term_id",
          "ontology_term_id")
      },
      outputColumns = Seq("id", "patient_id", "sex", "ethnicity_id",
        "ontology_term_id", Tsv.ProvenanceCol)))
    .register(EntityDef(
      "patient_count_helper", Seq("patient"),
      (_, in) => in("patient")
        .groupBy(col(Tsv.ProvenanceCol))
        .agg(count(lit(1)).as("n_patients"))))
    .register(EntityDef(
      "provider_search_index", Seq("patient", "patient_count_helper", "diagnosis_term"),
      (_, in) => {
        val pd = in("patient").join(
          in("diagnosis_term"),
          in("patient")("ontology_term_id") === in("diagnosis_term")("term_id"), "left")
        pd.groupBy(col(Tsv.ProvenanceCol))
          .agg(sort_array(collect_set(col("display_name"))).as("diagnoses"))
          .join(in("patient_count_helper"), Seq(Tsv.ProvenanceCol))
      },
      outputColumns = Seq(Tsv.ProvenanceCol, "diagnoses", "n_patients")))

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      Files.createTempDirectory("pdcm-pipeline").toString)
    PdcmSlice.stageProviders(work)

    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sources = Map(
      "raw_patient" -> Tsv.read(spark, Seq(s"$work/*/patient.tsv"),
        Seq("patient_id", "sex", "ethnicity", "diagnosis"),
        commentField = Some("patient_id")),
      "ontology_terms" -> Obo.read(spark, s"$work/ncit.obo"))

    val out = new PipelineRunner(spark, registry(), sources,
      checkpointDir = Some(s"$work/ckpt"))
      .run(Seq("patient", "provider_search_index"))

    PostgresTsv.write(out("patient"), s"$work/out/patient")
    PostgresTsv.write(out("provider_search_index"), s"$work/out/provider_search_index")

    println(s"[pdcm-pipeline] work=$work " +
      out.map { case (k, v) => s"$k=${v.count()}" }.mkString(" "))
    out("provider_search_index").orderBy(Tsv.ProvenanceCol).show(truncate = false)
    spark.stop()
  }
}
