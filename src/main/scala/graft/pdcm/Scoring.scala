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

  /** Facet definition (reference `search_facet_transformer_job.py:44-93`
    * over the `facets.py` registry, full 11-column contract). DYNAMIC
    * facets get the distinct sorted option list observed in `column`
    * (arrays exploded first); STATIC ones (`staticOptions` set) take
    * their configured option list and never scan the data.
    */
  final case class FacetDef(
      index: Int,
      section: String,
      name: String,
      description: String,
      column: String,
      example: String,
      anyOperator: String,
      allOperator: String,
      isBoolean: Boolean,
      facetType: String,
      staticOptions: Option[Seq[String]] = None)

  /** All facets in ONE pass: a single aggregate over `df` computes every
    * dynamic facet's distinct-sorted option array (the reference loops
    * facet-by-facet, rescanning search_index 25 times,
    * `search_facet_transformer_job.py:66-88`; a 25× union of the full
    * search_index plan also blows up plan-string generation). The one-row
    * aggregate result is then exploded into the 28 facet rows, with static
    * filters contributed as literals — one scan, one tiny explode,
    * regardless of facet count.
    */
  def buildFacets(df: DataFrame, facets: Seq[FacetDef]): DataFrame = {
    require(facets.nonEmpty)
    def meta(f: FacetDef, options: Column) = struct(
      lit(f.index).as("index"),
      lit(f.section).as("facet_section"),
      lit(f.name).as("facet_name"),
      lit(f.description).as("facet_description"),
      lit(f.column).as("facet_column"),
      options.as("facet_options"),
      lit(f.example).as("facet_example"),
      lit(f.anyOperator).as("any_operator"),
      lit(f.allOperator).as("all_operator"),
      lit(f.isBoolean).as("is_boolean"),
      lit(f.facetType).as("facet_type"))
    val dynamic = facets.filter(_.staticOptions.isEmpty)
    val aggs = dynamic.map { f =>
      val isArray = df.schema(f.column).dataType
        .isInstanceOf[org.apache.spark.sql.types.ArrayType]
      val collected =
        if (isArray)
          // Per-element sentinel cleaning, whole-array dedup map-side,
          // element dedup after the flatten.
          array_distinct(flatten(collect_set(filter(
            transform(col(f.column), v => Cleaning.sentinelToNull(v)),
            v => v.isNotNull))))
        else
          collect_set(Cleaning.sentinelToNull(col(f.column).cast("string")))
      sort_array(collected).as(s"_opt_${f.index}")
    }
    val oneRow =
      if (aggs.isEmpty) df.sparkSession.range(1).toDF()
      else df.agg(aggs.head, aggs.tail: _*)
    val rows = facets.map { f =>
      f.staticOptions match {
        case Some(opts) => meta(f, typedLit(opts))
        case None       => meta(f, col(s"_opt_${f.index}"))
      }
    }
    oneRow.select(explode(array(rows: _*)).as("f")).select("f.*")
  }
}
