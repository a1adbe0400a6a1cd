package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level validation with a quarantine channel — the ETL contract
  * that a bad row must never kill a 100 TB job NOR silently vanish:
  * every input row lands in exactly one of two frames, and quarantined
  * rows carry WHICH rules they broke.
  *
  * Rules are named violation predicates evaluated as one codegen'd
  * projection (no UDFs, no per-rule passes); the violation list is a
  * null-skipping `concat_ws`, so the whole check is a single scan that
  * both output frames share.
  */
object Validate {

  /** Adds a `violations` column: comma-joined names of the rules whose
    * violation predicate fired, empty string when clean.
    */
  def withViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    df.withColumn("violations",
      concat_ws(",", rules.map { case (name, bad) =>
        when(bad, lit(name))
      }: _*))
  }

  /** (clean rows without the marker column, quarantined rows with it). */
  def split(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val marked = withViolations(df, rules)
    (marked.filter(col("violations") === "").drop("violations"),
      marked.filter(col("violations") =!= ""))
  }
}
