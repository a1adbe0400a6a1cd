package graft.pdcm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cleaning

/** Config-driven model scoring (reference
  * `etl/jobs/transformation/scoring/` — SURVEY A6/A7). The reference
  * collects rows to the driver and scores them in Python with JSON
  * parsing (`generic_metadata_calculator.py:145-163`, breaking codegen
  * and distribution); here each weight term is a `when` column expression
  * summed in-plan — fully codegen'd and distributed.
  */
object Scoring {

  /** One weighted term: points awarded when `column` holds a usable value
    * (non-null after sentinel cleaning).
    */
  final case class Weight(column: String, points: Int)

  private def valid(c: Column): Column =
    Cleaning.sentinelToNull(c).isNotNull

  /** Percentage metadata score: earned points / max points * 100,
    * truncated to int (single exact division).
    */
  def metadataScore(weights: Seq[Weight]): Column = {
    require(weights.nonEmpty)
    val earned = weights
      .map(w => when(valid(col(w.column)), lit(w.points)).otherwise(lit(0)))
      .reduce(_ + _)
    val max = weights.map(_.points).sum
    floor(earned.cast("double") * 100 / max).cast("int")
  }

  /** Data score: |dataset_available| × 100 / totalKinds (reference
    * `data_calculator.py:6-19` uses 7 kinds).
    */
  def dataScore(datasetAvailable: Column, totalKinds: Int): Column =
    (size(datasetAvailable) * 100 / lit(totalKinds.toDouble)).cast("int")

  /** Facet definition (reference `search_facet_transformer_job.py:44-93`):
    * one output row per facet with the DISTINCT SORTED option list
    * observed in `column`.
    */
  final case class FacetDef(name: String, column: String, isBoolean: Boolean, index: Int)

  def buildFacets(df: DataFrame, facets: Seq[FacetDef]): DataFrame = {
    require(facets.nonEmpty)
    facets.map { f =>
      df.select(Cleaning.sentinelToNull(col(f.column)).as("v"))
        .filter(col("v").isNotNull)
        .agg(sort_array(collect_set(col("v"))).as("options"))
        .select(
          lit(f.name).as("facet_name"),
          lit(f.column).as("facet_column"),
          col("options"),
          lit(f.isBoolean).as("is_boolean"),
          lit(f.index).as("facet_index"))
    }.reduce(_ unionByName _)
  }
}
