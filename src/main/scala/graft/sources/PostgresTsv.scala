package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Postgres-COPY-ready TSV sink (reference S14,
  * `etl/jobs/util/parquet_to_tsv_converter.py:14-85` and
  * `flatten_array_columns`, `etl/jobs/util/dataframe_functions.py:66-81`):
  * array columns become `{a,b}` Postgres literals (elements quoted),
  * nulls become empty strings, embedded newlines/tabs are escaped, and
  * the result is written as headerless tab-separated part files that
  * `COPY` ingests directly — each Spark task writes one part file, so the
  * load parallelises with the cluster.
  */
object PostgresTsv {

  /** `array<string>` column → `{"a","b"}` Postgres array literal. */
  def arrayToPgLiteral(c: Column): Column =
    concat(
      lit("{"),
      array_join(transform(c, e => concat(lit("\""), e, lit("\""))), ","),
      lit("}"))

  /** Flatten every array column to its Postgres literal form. */
  def flattenArrayColumns(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case ArrayType(_, _) =>
          acc.withColumn(f.name, arrayToPgLiteral(col(f.name).cast("array<string>")))
        case _ => acc
      }
    }

  /** Escape embedded control characters for TSV transport
    * (reference `parquet_to_tsv_converter.py:60-73` — `\n` → `\\n`).
    */
  def escapeControlChars(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType.typeName == "string")
        acc.withColumn(
          f.name,
          regexp_replace(regexp_replace(col(f.name), "\n", "\\\\n"), "\t", "\\\\t"))
      else acc
    }

  /** Full COPY-prep: flatten arrays, escape, null → "". */
  def prepare(df: DataFrame): DataFrame = {
    val flat = escapeControlChars(flattenArrayColumns(df))
    val stringified = flat.schema.fields.foldLeft(flat) { (acc, f) =>
      if (f.dataType.typeName == "string") acc
      else acc.withColumn(f.name, col(f.name).cast("string"))
    }
    stringified.na.fill("")
  }

  /** Write COPY-ready TSV part files. */
  def write(df: DataFrame, path: String): Unit =
    prepare(df).write
      .mode("overwrite")
      .option("sep", "\t")
      .option("header", "false")
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(path)
}
