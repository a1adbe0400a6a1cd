package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** At-rest layout strategies for the 100 TB tier. The reference writes
  * flat per-entity directories (`etl/workflow/transformer.py:74-79` —
  * SURVEY §4 "partition pruning: none"); at scale the layout IS the
  * index:
  *
  *  - **Partition by coarse filter keys** (provider/data_source, date):
  *    queries filtering on them scan only matching directories
  *    (PartitionFilters in the plan, zero I/O elsewhere).
  *  - **Bucket + sort by join keys**: two tables bucketed the same way
  *    join with NO exchange on either side — the shuffle happened once at
  *    write time and is amortized over every subsequent join.
  */
object Layout {

  /** Directory-partitioned parquet (hive layout `col=value/`). Keep
    * partition columns low-cardinality: one dir per value.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table (bucket pruning + shuffle-free
    * joins/aggregations on `bucketCol` for every reader).
    */
  def writeBucketed(
      df: DataFrame,
      spark: SparkSession,
      table: String,
      bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", s"${spark.conf.get("spark.sql.warehouse.dir")}/$table")
      .saveAsTable(table)
}
