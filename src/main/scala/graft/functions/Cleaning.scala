package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column/DataFrame cleaning primitives.
  *
  * Mirrors the reference's cleaner utilities (pdcm-etl
  * `etl/jobs/util/cleaner.py:8-39` and `etl/workflow/spark_reader.py:31-44`)
  * as pure, codegen-friendly Spark column expressions — no UDFs.
  */
object Cleaning {

  /** Non-breaking-space → space, then trim. Reference: `cleaner.py:8-13`
    * (`trim_all_str`). Applied to both data values and column names.
    */
  def trimAll(c: Column): Column = trim(regexp_replace(c, " ", " "))

  /** Collapse runs of whitespace to a single space and trim.
    * Reference: `cleaner.py:38-39` (`remove_all_trailing_whitespaces` UDF) —
    * here a pure regexp, no UDF needed.
    */
  def squeezeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Clean a raw string column name the way the reference cleans header
    * cells: NBSP → space, trim. Reference: `spark_reader.py:40-44`.
    */
  def cleanName(name: String): String =
    name.replace(" ", " ").trim

  /** Rename every column of `df` with [[cleanName]].
    * Reference: `spark_reader.py:40-44`.
    */
  def cleanColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(cleanName).toIndexedSeq: _*)

  /** Drop provider-template comment rows: rows whose `field` column starts
    * with '#'. Reference: `spark_reader.py:31-37`
    * (`nvl(field,'') not like '#%'`).
    */
  def filterCommentRows(df: DataFrame, field: String = "field"): DataFrame =
    if (df.columns.contains(field))
      df.filter(!coalesce(col(field), lit("")).startsWith("#"))
    else df

  /** Null → default coercion before a DB load: string null → "",
    * boolean null → false. Reference: `cleaner.py:29-35`.
    */
  def nullsToDefaults(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case f if f.dataType.typeName == "string" => f.name
    }
    val boolCols = df.schema.fields.collect {
      case f if f.dataType.typeName == "boolean" => f.name
    }
    val filledStr =
      if (stringCols.nonEmpty) df.na.fill("", stringCols.toIndexedSeq) else df
    if (boolCols.nonEmpty) filledStr.na.fill(false, boolCols.toIndexedSeq)
    else filledStr
  }

  /** Age-string → display bucket (reference `_bin_age` UDF,
    * `search_index_patient_sample_transformer_job.py:154-172`): months for
    * under-2s, "2 - 9", then decades. Null-safe cast handles the
    * all-string raw data; unparseable ages return null.
    */
  def binAge(age: Column): Column = {
    // try_cast: ANSI mode (Spark 4 default) makes a plain cast THROW on
    // malformed strings — all-string raw data must degrade to null.
    val a = trimAll(age).try_cast("double")
    when(a.isNull, lit(null).cast("string"))
      .when(a < 2, lit("0 - 23 months"))
      .when(a < 10, lit("2 - 9"))
      .otherwise(concat(
        (floor(a / 10) * 10).cast("int").cast("string"),
        lit(" - "),
        (floor(a / 10) * 10 + 9).cast("int").cast("string")))
  }

  /** Treat sentinel strings ("Not Provided", "Not Collected", "") as null.
    * Reference pattern: `search_index_transformer_job.py:124`,
    * `treatment_aggregator_helper_transformer_job.py:94-98`.
    */
  def sentinelToNull(
      c: Column,
      sentinels: Seq[String] = Seq("Not Provided", "Not Collected", "")
  ): Column =
    when(lower(trimAll(c)).isin(sentinels.map(_.toLowerCase): _*), lit(null))
      .otherwise(c)
}
