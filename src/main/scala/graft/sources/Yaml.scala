package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** YAML source (reference S6, `etl/workflow/spark_reader.py:145-192`):
  * per-provider YAML documents are parsed driver-side, converted to JSON,
  * and handed to `spark.read.json(Dataset[String])` — schemas stay
  * engine-inferred from JSON exactly like the reference. Provider YAMLs
  * are small config/metadata files; the data volume lives in TSVs.
  */
object Yaml {

  private lazy val yamlMapper = new ObjectMapper(new YAMLFactory())
  private lazy val jsonMapper = new ObjectMapper()

  /** YAML text → JSON text (one document). */
  def toJson(yaml: String): String =
    jsonMapper.writeValueAsString(yamlMapper.readTree(yaml))

  /** Read one YAML document per file into a DataFrame (schema inferred,
    * one row per document; select your declared columns downstream).
    */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val jsons = paths.map { p =>
      val src = scala.io.Source.fromFile(p)
      try toJson(src.mkString)
      finally src.close()
    }
    import spark.implicits._
    spark.read.json(spark.createDataset(jsons))
  }

  /** Full S6 module semantics (reference `ReadYamlsByModule`,
    * `spark_reader.py:151-192`): one YAML per provider, DECLARED columns
    * projected all-string (missing keys become typed nulls), provenance
    * stamped, and the per-provider frames unioned by name. No providers →
    * typed empty frame (S5).
    */
  def readModule(
      spark: SparkSession,
      providerPaths: Map[String, String],
      columns: Seq[String]): DataFrame = {
    val frames = providerPaths.toSeq.sortBy(_._1).map { case (provider, path) =>
      val df = read(spark, Seq(path))
      val projected = columns.map(c =>
        if (df.columns.contains(c)) col(c).cast("string").as(c)
        else lit(null).cast("string").as(c))
      df.select(projected: _*).withColumn(Tsv.ProvenanceCol, lit(provider))
    }
    frames.reduceOption(_.unionByName(_)).getOrElse {
      val schema = StructType(
        (columns :+ Tsv.ProvenanceCol).map(StructField(_, StringType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }
  }
}
