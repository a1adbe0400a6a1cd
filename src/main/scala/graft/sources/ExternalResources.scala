package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** External-resource registry + downloaded-resource ingestion (reference
  * S11/S12, `etl/workflow/readers/external_resources_reader.py:32-144`).
  *
  *  - S11 config-as-table: the curated resource definitions (id, label,
  *    type, link template) become an ordinary small DataFrame — the same
  *    shape the reference builds from `model_links_resources.yaml`.
  *  - S12 downloaded CSVs: for each configured resource, read its
  *    processed CSV, stamp label/type, expand the link template with the
  *    row's entry id, and union. The loop is config-sized (a handful of
  *    resources), each read is distributed, and the per-resource columns
  *    are constants — so the union stays a cheap scan-side plan at any
  *    data size.
  */
object ExternalResources {

  final case class ResourceDef(
      id: Int,
      name: String,
      label: String,
      resourceType: String,
      linkBuildingMethod: String,
      linkTemplate: String)

  /** Which processed CSV backs each downloadable resource. */
  final case class DownloadConf(resourceId: Int, processedFile: String)

  val entrySchema: StructType = StructType(Seq(
    StructField("entry_id", StringType),
    StructField("entry", StringType)))

  /** S11: the resource registry as a DataFrame (broadcastable config). */
  def resourcesTable(spark: SparkSession, resources: Seq[ResourceDef]): DataFrame = {
    import spark.implicits._
    resources.toDF()
      .select(col("id"), col("name"), col("label"),
        col("resourceType").as("type"),
        col("linkBuildingMethod").as("link_building_method"),
        col("linkTemplate").as("link_template"))
  }

  /** S12: fold the configured downloaded CSVs into one
    * (entry, type, resource, link) table. Missing files degrade to empty
    * (S5 semantics).
    */
  def readDownloaded(
      spark: SparkSession,
      dir: String,
      resources: Seq[ResourceDef],
      confs: Seq[DownloadConf]): DataFrame = {
    val byId = resources.map(r => r.id -> r).toMap
    val outSchema = StructType(Seq(
      StructField("entry", StringType), StructField("type", StringType),
      StructField("resource", StringType), StructField("link", StringType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    confs.flatMap(c => byId.get(c.resourceId).map((_, c))).foldLeft(empty) {
      case (acc, (r, c)) =>
        val path = s"$dir/externalDBs/${c.processedFile}"
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) acc
        else {
          val csv = spark.read.option("sep", ",").option("header", "true")
            .schema(entrySchema).csv(path)
          acc.union(csv.select(
            col("entry"),
            lit(r.resourceType).as("type"),
            lit(r.label).as("resource"),
            replace(lit(r.linkTemplate), lit("ENTRY_ID"), col("entry_id"))
              .as("link")))
        }
    }
  }
}
