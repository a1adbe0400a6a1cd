package graft.examples

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Cleaning, Ids}
import graft.graph.OntologyGraph
import graft.operators.Relational
import graft.sources.{Obo, PostgresTsv, Tsv}

/** Minimum end-to-end PDCM slice (SURVEY §7.2 step 2): provider TSVs →
  * clean → dedup → deterministic ids → FK resolution → ontology-term
  * mapping → COPY-ready TSV sink. Exercises the scan/clean/dedup/
  * id-assign/FK-join/projection skeleton that ~40 of the reference's 60
  * entities share (`etl/jobs/transformation/patient_transformer_job.py`).
  *
  * Run: sbt "runMain graft.examples.PdcmSlice [workDir]"
  * Writes entity TSVs under workDir/out and prints row counts.
  */
object PdcmSlice {

  def stageProviders(root: String): Unit = {
    def write(path: String, content: String): Unit = {
      Files.createDirectories(Paths.get(path).getParent)
      Files.writeString(Paths.get(path), content)
    }
    write(s"$root/providerA/patient.tsv",
      "patient_id\tsex\tethnicity\tdiagnosis\n" +
        "#field descriptions row\t\t\t\n" +
        "PA-1\tfemale\tHispanic\tMalignant Lung Neoplasm\n" +
        "PA-2\tMale\tNot Provided\tBreast Neoplasm\n" +
        "PA-2\tMale\tNot Provided\tBreast Neoplasm\n")
    write(s"$root/providerB/patient.tsv",
      "patient_id\tsex\tethnicity\tdiagnosis\n" +
        "PB-1\tfemale\tAsian\tColon Neoplasm\n")
    write(s"$root/ncit.obo",
      """[Term]
        |id: NCIT:C3262
        |name: Neoplasm
        |
        |[Term]
        |id: NCIT:C1000
        |name: Malignant Lung Neoplasm
        |is_a: NCIT:C3262 ! Neoplasm
        |
        |[Term]
        |id: NCIT:C2000
        |name: Breast Neoplasm
        |is_a: NCIT:C3262 ! Neoplasm
        |
        |[Term]
        |id: NCIT:C3000
        |name: Colon Neoplasm
        |is_a: NCIT:C3262 ! Neoplasm
        |""".stripMargin)
  }

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      Files.createTempDirectory("pdcm-slice").toString)
    stageProviders(work)

    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. Extract: glob scan with declared schema + provenance (S1-S5).
    val rawPatients = Tsv.read(
      spark, Seq(s"$work/*/patient.tsv"),
      Seq("patient_id", "sex", "ethnicity", "diagnosis"),
      commentField = Some("patient_id"))

    // 2. Clean + dedup + deterministic ids (P2-P5).
    val patients = rawPatients
      .withColumn("sex", initcap(Cleaning.trimAll(col("sex"))))
      .withColumn("ethnicity", Cleaning.sentinelToNull(col("ethnicity")))
      .dropDuplicates("patient_id", Tsv.ProvenanceCol)
      .withColumn("id", Ids.hashId(col("patient_id"), col(Tsv.ProvenanceCol)))

    // 3. Ontology: OBO → driver graph → broadcastable term table (§2.10).
    val oboTerms = Obo.read(spark, s"$work/ncit.obo")
    val graph = OntologyGraph.fromTerms(
      Obo.parse(Files.readString(Paths.get(s"$work/ncit.obo")).linesIterator))
    val diagnosisTerms = oboTerms
      .select(col("term_id"), col("term_name"))
      .withColumn("display_name",
        udf(OntologyGraph.updateTermName _).apply(col("term_name")))

    // 4. FK-resolve diagnosis → ontology term (J1 over a broadcast dim).
    val withTerm = Relational.transformToFk(
      patients, diagnosisTerms, "diagnosis", "term_name", "term_id", "ontology_term_id")

    val entity = Relational.transformToFk(
      withTerm, diagnosisTerms, "diagnosis", "term_name", "display_name", "diagnosis_display")
      .select("id", "patient_id", "sex", "ethnicity", "diagnosis",
        "ontology_term_id", "diagnosis_display", Tsv.ProvenanceCol)

    // 5. Sink: COPY-ready TSV (S14).
    PostgresTsv.write(entity, s"$work/out/patient")

    val n = spark.read.option("sep", "\t").csv(s"$work/out/patient").count()
    val ancestors = graph.termAncestorsDf(spark).count()
    println(s"[pdcm-slice] work=$work entities=${entity.count()} tsv_rows=$n " +
      s"ancestor_rows=$ancestors")
    entity.orderBy("patient_id").show(truncate = false)
    spark.stop()
  }
}
