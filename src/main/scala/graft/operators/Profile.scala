package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler — the "describe my 100 TB table" operator a
  * curation pipeline runs before deciding cleaning rules (null-rate
  * thresholds, sentinel detection, cardinality-based encoding choices).
  *
  * All per-column statistics are computed in ONE aggregate over ONE scan:
  * Catalyst plans the multi-`countDistinct` via a single Expand (rows ×
  * n_profiled_columns), so the cost is one shuffle regardless of column
  * count — not a per-column scan loop, which at 100 TB would multiply
  * I/O by the column count.
  *
  * Values are surfaced as strings (min/max/example) so one schema covers
  * every column type; exact distinct counts make the profile
  * deterministic and cross-engine checkable (SparkEntry q96).
  */
object Profile {

  /** One row per profiled column:
    * `(column, n_rows, n_nulls, n_distinct, min_value, max_value)`.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(col(c)).as(s"__nonnull_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // Pivot the single wide row to one row per column: a stack() over
    // literal column references — no second scan, the wide row is tiny.
    val stacked = columns.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"),
        (col(s"__rows_$c") - col(s"__nonnull_$c")).as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }

  /** [[profile]] with the distinct count estimated by the KMV sketch
    * (`n_distinct_est`, O(k) state per column) instead of exact
    * `countDistinct` — at 100 TB the exact form's Expand keeps every
    * distinct value alive through the shuffle per column, while k
    * doubles per column is a constant. EXACT below k distinct values
    * (the KMV exact regime, q75); ~1/sqrt(k) relative error above.
    */
  def profileApprox(df: DataFrame, columns: Seq[String], k: Int = 256): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    import graft.plans.SketchAggregates
    def unitHash(c: Column): Column =
      conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long").cast("double") / 4294967296.0
    val aggs = columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(col(c)).as(s"__nonnull_$c"),
        SketchAggregates.kmvDistinct(unitHash(col(c)), k).as(s"__kmv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = columns.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"),
        (col(s"__rows_$c") - col(s"__nonnull_$c")).as("n_nulls"),
        round(col(s"__kmv_$c")).cast("long").as("n_distinct_est"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }
}
