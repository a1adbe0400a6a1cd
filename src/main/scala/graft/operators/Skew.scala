package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for 100 TB joins/aggregations.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; salting
  * is the explicit fallback when a handful of hot keys dominate a
  * shuffled join or aggregation (e.g. one provider contributing half the
  * corpus). Salting fans each hot fact row into one of `salts` subkeys
  * and replicates the (small) build side once per salt — shuffle
  * partitions then bound at ~1/salts of the hot key's volume.
  */
object Skew {

  /** Salted equi-join: fact gets a deterministic salt from xxhash64 of its
    * whole row-key; the build side is replicated `salts` times. Result
    * equals `fact.join(build, keys)` exactly (inner join).
    */
  def saltedJoin(
      fact: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0)
    // Deterministic salt from the full fact row (identical duplicate rows
    // share a salt — acceptable; nondeterministic salts would break on
    // stage retry at scale).
    val saltedFact = fact.withColumn(
      "__salt", pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedBuild = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact
      .join(saltedBuild, keys :+ "__salt")
      .drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. Expressed for the common
    * count/sum shapes; the partial shuffle spreads a hot key over
    * `salts` partitions.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
