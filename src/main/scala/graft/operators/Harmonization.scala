package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered match-waterfall harmonization (reference
  * `etl/jobs/transformation/harmonisation/markers_harmonisation.py:7-141`):
  * rows try each lookup stage in priority order — approved symbol, then
  * previous symbol, then alias, then ensembl id, then ncbi id in the
  * reference — and a stage only claims a row when it has EXACTLY ONE
  * candidate (ambiguous keys fall through to later stages; rows no stage
  * claims come back unmatched).
  *
  * Implementation is the aggregate-join form of the reference's
  * correlated `count(1)` subquery (SURVEY J9): per stage, keys with one
  * candidate are selected by a groupBy/filter, matched rows leave the
  * working set via an anti-join, and stage outputs are unioned by name.
  * Each stage costs one broadcastable join on the (small) lookup + one
  * anti-join on the shrinking working set — no correlated subqueries, no
  * driver loops over data.
  */
object Harmonization {

  /** One waterfall stage: join `factKey` against `lookupKey` in `lookup`,
    * claiming rows whose key has exactly one lookup candidate. `payload`
    * columns are carried from the lookup into the output.
    */
  final case class Stage(
      name: String,
      lookup: DataFrame,
      factKey: String,
      lookupKey: String,
      payload: Seq[String])

  /** Returns (harmonized, unmatched): `harmonized` = one row per claimed
    * fact row + `match_stage` + payload columns; `unmatched` = fact rows
    * no stage claimed (original columns).
    *
    * `broadcastDim = true` (default) fits HGNC-sized lookups — each stage
    * is then a broadcast join and the fact side never shuffles. Pass
    * `false` for a fact-sized lookup (mirrors
    * [[Relational.transformToFk]]): stages become shuffle hash joins
    * instead of forcing the whole lookup through the driver.
    */
  def waterfall(
      fact: DataFrame,
      stages: Seq[Stage],
      broadcastDim: Boolean = true): (DataFrame, DataFrame) = {
    require(stages.nonEmpty)
    def side(df: DataFrame): DataFrame = if (broadcastDim) broadcast(df) else df
    val payloadCols = stages.flatMap(_.payload).distinct
    var remaining = fact
    var harmonized: Option[DataFrame] = None
    stages.foreach { st =>
      val unique = st.lookup
        .groupBy(col(st.lookupKey)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") === 1).drop("__n")
        .join(st.lookup, Seq(st.lookupKey))
        .select((col(st.lookupKey).as("__match_key") +: st.payload.map(col)): _*)
      val claimed = remaining
        .join(side(unique), remaining(st.factKey) === unique("__match_key"), "inner")
        .drop("__match_key")
        .withColumn("match_stage", lit(st.name))
      // Align payload columns across stages (absent ones null).
      val aligned = payloadCols.foldLeft(claimed) { (df, c) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
      }
      harmonized = harmonized match {
        case None => Some(aligned)
        case Some(acc) => Some(acc.unionByName(aligned))
      }
      remaining = remaining.join(
        side(unique), remaining(st.factKey) === unique("__match_key"), "left_anti")
    }
    (harmonized.get, remaining)
  }
}
