package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Live relational-database sink/source (reference S15 — the
  * `psycopg2 COPY` load at `etl/jobs/load/database_manager.py`): the
  * last mile of the pipeline, pushing finished entities into the
  * serving database.
  *
  * On Spark this is the built-in JDBC writer: each partition opens one
  * connection and streams its rows as batched INSERTs, so the load
  * parallelises with the cluster exactly like the reference's
  * per-file COPY loop — but with no TSV staging hop. For a Postgres
  * target the fastest path remains [[PostgresTsv]] + `COPY`; this
  * writer is the direct form for targets where a COPY side-channel
  * isn't available, and the read side is how a migration job pulls an
  * existing database INTO the lake.
  *
  * `numPartitions` caps writer-side connections — a 1000-executor
  * cluster must not open 32000 connections against one database;
  * `batchsize` amortizes network round-trips per INSERT.
  */
object Jdbc {

  /** Write `df` into `table` at `url`. Array columns are flattened to
    * their Postgres literal form first ([[PostgresTsv.arrayToPgLiteral]])
    * so the row shape matches what the COPY path produces.
    */
  def write(
      df: DataFrame, url: String, table: String,
      properties: Properties = new Properties(),
      mode: SaveMode = SaveMode.Overwrite,
      numPartitions: Int = 8,
      batchSize: Int = 1000): Unit =
    PostgresTsv.flattenArrayColumns(df)
      .coalesce(numPartitions)
      .write.mode(mode)
      .option("batchsize", batchSize.toLong)
      .jdbc(url, table, properties)

  /** Read `table` back as a DataFrame (the migration/backfill source). */
  def read(
      spark: SparkSession, url: String, table: String,
      properties: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, properties)
}
