package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers of the query registry (moved verbatim from
  * SparkEntry): the parquet table reader, the exact-money cast, and the
  * language marker/profile tables both the Spark queries and the oracle
  * SQL builders consume.
  */
private[graft] object QueryDsl {
  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val dec = "decimal(18,2)"

  val discPrice: Column =
    col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount")).cast(dec)

  val ngramProfiles: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "sch", "ein", "ich"),
    "en" -> Seq("the", " th", "he ", "ing", "and"),
    "es" -> Seq("de ", "la ", "os ", "ion"),
    "fr" -> Seq("le ", "es ", "ent", "eau"),
    "zh" -> Seq("的", "是", "了")
  )

  val langMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und"),
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"),
    "zh" -> Seq("的", "是", "了", "在")
  )

}
