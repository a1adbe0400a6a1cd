package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL corpus source — the interchange format most large text
  * corpora ship in (one JSON document per line). Reading follows the
  * same contract as the TSV tier ([[Tsv]]): DECLARED schema (never
  * inferred — inference is a full extra pass over 100 TB), one-pass
  * scan, and malformed lines quarantined instead of killing the job or
  * silently vanishing.
  *
  * Spark's native json reader does the heavy lifting (PERMISSIVE mode
  * + `columnNameOfCorruptRecord`): a bad line yields a row whose data
  * columns are null and whose corrupt column holds the raw line — the
  * split into (clean, quarantine) is then a pair of codegen'd filters
  * over ONE scan, the same pattern as the q101 row-quarantine channel.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Read `paths` with `schema`; returns (clean rows, quarantined raw
    * lines). Clean rows carry exactly `schema`'s columns; quarantine
    * rows are (raw_line, input_file) for the reprocessing queue.
    *
    * Implementation is a TEXT scan + codegen'd `from_json`, not the
    * raw json reader: Spark refuses plans that project only the
    * corrupt column from a raw json scan (its documented workaround is
    * caching the parsed corpus — a non-starter at 100 TB), while the
    * text-scan form keeps both branches as plain filters over one
    * line-level scan.
    */
  def readWithQuarantine(
      spark: SparkSession, paths: Seq[String], schema: StructType):
      (DataFrame, DataFrame) = {
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read.text(paths: _*)
      .select(col("value"), input_file_name().as("input_file"))
      .withColumn("j", from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
    val clean = raw.filter(col(s"j.$CorruptCol").isNull)
      .select(schema.fieldNames.toSeq.map(f => col(s"j.$f").as(f)): _*)
    val quarantine = raw.filter(col(s"j.$CorruptCol").isNotNull)
      .select(col("value").as("raw_line"), col("input_file"))
    (clean, quarantine)
  }

  /** Clean rows only (quarantine dropped) — the common read path. */
  def read(spark: SparkSession, paths: Seq[String], schema: StructType): DataFrame =
    readWithQuarantine(spark, paths, schema)._1

  /** Streaming variant: a continuously-arriving JSONL drop directory
    * (the shape corpus deliveries actually take) as a clean-row stream —
    * same text-scan + from_json plan as the batch path, so malformed
    * lines are dropped per-row instead of failing the trigger. Pair
    * with [[Snapshots.ingestWriter]] for exactly-once snapshot commits
    * per micro-batch (StreamingSpec drives the combination).
    */
  def stream(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    spark.readStream.text(dir)
      .withColumn("j", from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
      .filter(col(s"j.$CorruptCol").isNull)
      .select(schema.fieldNames.toSeq.map(f => col(s"j.$f").as(f)): _*)
  }
}
