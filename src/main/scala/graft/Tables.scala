package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table access + session defaults shared by Verify/Bench/tests.
  *
  * The synthetic `events` table carries nanosecond parquet timestamps,
  * which Spark's vectorized reader rejects by default; sessions created
  * through [[Tables.sessionConfigs]] read them as nanos-since-epoch longs
  * and [[Tables.events]] restores a proper TimestampType column
  * (microsecond truncation — the same truncation DuckDB applies, so
  * oracles agree).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Configs every engine session should carry (local or cluster). */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true"
  )

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with `ts` normalized to TimestampType.
    *
    * The testdata has shipped `ts` two ways across rounds: nanosecond
    * parquet timestamps (read as nanos-since-epoch longs under the
    * `nanosAsLong` session flag — restored here with µs truncation, the
    * same truncation DuckDB applies) and plain `timestamp[us]` with
    * isAdjustedToUTC=false, which Spark 4 reads as TIMESTAMP_NTZ. The
    * NTZ case is cast to TIMESTAMP: the engine session timezone is
    * pinned to UTC (see [[sessionConfigs]]), so the wall-clock values —
    * and every DuckDB oracle — are unchanged, while `unix_micros` and
    * streaming watermarks (which require TIMESTAMP) work again.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType.typeName match {
      case "long"          => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _               => raw
    }
  }
}
