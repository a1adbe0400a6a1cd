package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational composite operators mirroring the reference's join/agg idioms
  * (SURVEY §2.3/§2.4), re-expressed as reusable Spark-first combinators.
  */
object Relational {

  /** Generic FK resolution: left-join `fact` to `dim` on
    * `fact(factKey) == dim(dimKey)`, attaching `dim(dimId)` renamed to
    * `fkName`. Reference: `etl/jobs/util/dataframe_functions.py:47-63`
    * (`transform_to_fk`).
    *
    * Scale note: pass `broadcastDim = true` (default) for dimension tables —
    * FK dims in this workload are small; a broadcast hash join avoids
    * shuffling the 100 TB fact side entirely.
    */
  def transformToFk(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      dimId: String,
      fkName: String,
      broadcastDim: Boolean = true
  ): DataFrame = {
    val d0 = dim.select(col(dimId).as(fkName), col(dimKey).as(s"__dim_$dimKey"))
    val d = if (broadcastDim) broadcast(d0) else d0
    fact
      .join(d, fact(factKey) === d(s"__dim_$dimKey"), "left")
      .drop(s"__dim_$dimKey")
  }

  /** Null-safe multi-key left join (reference J2:
    * `model_transformer_job.py:97-109` uses `eqNullSafe` on
    * name+email+data_source).
    */
  def nullSafeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      joinType: String = "left"
  ): DataFrame = {
    // Alias both sides so the join condition references distinct attribute
    // ids even when left/right share lineage (e.g. two aggregations of the
    // same frame): `left(k) <=> right(k)` would otherwise resolve both to
    // the SAME attribute — a trivially-true predicate that only works via
    // fragile self-join disambiguation heuristics (and warns).
    val l = left.as("__nsj_l")
    val r = right.as("__nsj_r")
    val cond = keys.map(k => col(s"__nsj_l.$k") <=> col(s"__nsj_r.$k")).reduce(_ && _)
    l.join(r, cond, joinType)
  }

  /** "Exactly-one-match" lookup (reference J9,
    * `harmonisation/markers_harmonisation.py:99-141`): rows of `fact` get a
    * match from `lookup` only when precisely ONE lookup row has that key;
    * ambiguous keys fall through unmatched. Implemented as aggregate-join
    * (no correlated subquery): count per key, keep count==1, inner-join.
    */
  def exactlyOneJoin(
      fact: DataFrame,
      lookup: DataFrame,
      factKey: String,
      lookupKey: String
  ): DataFrame = {
    // Count-over-window instead of groupBy + join-back: one shuffle of the
    // lookup instead of two (plan audit: q09 dropped from 5 exchanges).
    import org.apache.spark.sql.expressions.Window
    val unique = lookup
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(lookupKey))))
      .filter(col("__n") === 1)
      .drop("__n")
    fact.join(unique, fact(factKey) === unique(lookupKey), "inner")
  }

  /** Join-back of an aggregated column (reference J10): groupBy `key`,
    * aggregate, left-join the result back so the fact keeps its grain.
    * For row-preserving aggregates prefer a Window — this variant is for
    * set/list aggregates where the grouped cardinality is much smaller.
    */
  def joinBackAgg(
      fact: DataFrame,
      key: String,
      aggCols: Seq[Column]
  ): DataFrame = {
    val agged = fact.groupBy(col(key)).agg(aggCols.head, aggCols.tail: _*)
    fact.join(agged, Seq(key), "left")
  }

  /** Array-equality join (reference J7,
    * `treatment_data_aggregator_by_model.py:276-278`): joins rows whose
    * SORTED element lists are equal — the reference's regimen-discovery
    * trick. Sorting both sides makes the equality order-insensitive; the
    * join key is the array itself (Spark hashes arrays natively).
    */
  def sortedArrayJoin(
      left: DataFrame,
      leftArr: String,
      right: DataFrame,
      rightArr: String,
      joinType: String = "inner"
  ): DataFrame = {
    val l = left.withColumn(leftArr, sort_array(col(leftArr)))
    val r = right.withColumn(rightArr, sort_array(col(rightArr)))
    l.join(r, l(leftArr) === r(rightArr), joinType)
  }

  /** Conditional non-null count per group for every listed column
    * (reference A4, `available_molecular_data_columns_transformer_job.py:151-158`).
    */
  def nonNullCounts(df: DataFrame, groupCol: String, cols: Seq[String]): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        sum(col(cols.head).isNotNull.cast("long")).as(cols.head),
        cols.tail.map(c => sum(col(c).isNotNull.cast("long")).as(c)): _*
      )

  /** As-of join: for every left row, attach the single most recent right
    * row with `right(timeCol) <= left(timeCol)` for the same key — the
    * classic time-series operator Spark's joins lack. Composed Spark-first
    * (SURVEY §2 preference (a)): tag both sides, union, and take
    * `last(value, ignoreNulls)` over a key-partitioned time-ordered
    * window. One shuffle + one sort — no range cross-join, no per-key
    * driver loop; at 100 TB this is a single repartition by key.
    *
    * The right side must be unique per (key, time) — pre-aggregate it if
    * not (ties would otherwise be resolution-order-dependent). At equal
    * timestamps the right row is considered visible to the left row.
    *
    * Returns the left columns plus `asOfCol` = right `valueCol` (null when
    * no right row precedes).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      asOfCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("__is_right", lit(0))
    val r = right.select(
      (Seq(col(keyCol), col(timeCol), col(valueCol).as("__v"), lit(1).as("__is_right")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // At equal time, right sorts before left (__is_right desc) so the
    // right value is visible to the left row.
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asOfCol, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(leftCols.map(col) :+ col(asOfCol): _*)
  }

  /** Banded range join: pairs (l, r) with the same `keyCol` and
    * `|l.timeCol - r.timeCol| <= tolerance` (seconds). Spark plans a raw
    * inequality join as a nested-loop product; bucketizing time into
    * `tolerance`-wide bands turns it into an equi-join on (key, band) —
    * each left row probes its own and both adjacent bands, then the exact
    * predicate filters. Shuffle-partitionable by (key, band) at any scale.
    */
  def bandedRangeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      toleranceSeconds: Long
  ): DataFrame = {
    // Microsecond precision throughout: floored-seconds comparisons drop
    // sub-second timestamp components and disagree with exact engines.
    val tolMicros = toleranceSeconds * 1000000L
    val band = (c: Column) => floor(unix_micros(c) / tolMicros)
    val l = left.withColumn("__lband",
      explode(array(band(col(timeCol)) - 1, band(col(timeCol)), band(col(timeCol)) + 1)))
    val lCols = left.columns.map(c => col(c).as(s"l_$c")).toIndexedSeq
    val rCols = right.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq
    val lt = l.select(lCols :+ col("__lband"): _*)
    val rt = right.withColumn("__rband", band(col(timeCol))).select(rCols :+ col("__rband"): _*)
    lt.join(rt,
        col(s"l_$keyCol") === col(s"r_$keyCol") && col("__lband") === col("__rband"))
      .filter(
        abs(unix_micros(col(s"l_$timeCol")) - unix_micros(col(s"r_$timeCol")))
          <= tolMicros)
      .drop("__lband", "__rband")
  }

  /** Positional-cardinality match after splitting two parallel delimited
    * columns (reference `treatment_and_component_helper_transformer_job.py:98-133`):
    * explode `aCol` and `bCol` (both "+"-separated) positionally, keeping
    * only rows where the two lists have equal length; rows with mismatched
    * cardinality are returned separately (the reference left-anti branch J4).
    */
  def posexplodeMatched(
      df: DataFrame,
      aCol: String,
      bCol: String,
      sep: String = "\\+"
  ): (DataFrame, DataFrame) = {
    val withArrays = df
      .withColumn("__a", split(col(aCol), sep))
      .withColumn("__b", split(col(bCol), sep))
    val matched = withArrays
      .filter(size(col("__a")) === size(col("__b")))
      .select(
        df.columns.map(col).toIndexedSeq :+
          posexplode(arrays_zip(col("__a"), col("__b"))): _*
      )
      .withColumn(aCol, trim(col("col.__a")))
      .withColumn(bCol, trim(col("col.__b")))
      .drop("col", "__a", "__b")
    val mismatched =
      withArrays.filter(size(col("__a")) =!= size(col("__b")))
        .drop("__a", "__b")
    (matched, mismatched)
  }

  /** Per-key unordered pair stream (`item_a < item_b`) from a distinct
    * (key, item) table — the wedge-join shape behind co-occurrence /
    * co-purchase graphs (q164/q211/q248/q251/q264). Output is
    * Σ C(width(key), 2): data-bounded while basket widths are (TPC-H
    * orders hold ≤ 7 parts), but a single hot key of width 10⁵ would
    * emit 5·10⁹ rows — `maxWidth` is the q121-style guard for that
    * regime.
    *
    * `maxWidth = Some(w)`: keys whose item count exceeds `w` are DROPPED
    * from the pair stream entirely (skip, never silently sample — the
    * dropped keys are enumerable via [[overWidthKeys]] so callers can
    * report the excluded mass; the no-silent-caps rule). The width
    * pre-pass is one map-combinable count per key, key-sized.
    *
    * `maxWidth = None` (default): no pre-pass, plan identical to the
    * bare self-join — zero cost on the default path.
    */
  /** Rows-derived default for the [[keyedPairs]] width cap — the
    * `Geo.scaledEps` / `Dedup.defaultNCells` precedent (density knobs
    * derive from corpus size, not constants): `max(64, ceil(sqrt(N)))`.
    * A key of width w emits w(w−1)/2 pairs, so capping w at √N bounds
    * ANY single key's pair output by the corpus row budget N/2 — the
    * wedge join stays corpus-linear BY POLICY as the data grows. On
    * data whose key widths are structurally bounded (TPC-H baskets ≤ 7)
    * the cap never binds and the output is bit-identical to the
    * uncapped plan at every scale; it exists for genuinely skewed keys
    * (a viral basket, a stop-gram), where the dropped keys remain
    * reportable through [[overWidthKeys]].
    */
  def scaledMaxWidth(corpusRows: Long): Int =
    math.min(
      math.max(64L, math.ceil(math.sqrt(corpusRows.toDouble)).toLong),
      Int.MaxValue.toLong).toInt

  def keyedPairs(
      items: DataFrame,
      keyCol: String,
      itemCol: String,
      maxWidth: Option[Int] = None): DataFrame = {
    val kept = maxWidth match {
      case None => items
      case Some(w) =>
        items.join(
          items.groupBy(col(keyCol)).agg(count(lit(1)).as("__width"))
            .filter(col("__width") <= w).select(col(keyCol)),
          Seq(keyCol), "left_semi")
    }
    kept.select(col(keyCol), col(itemCol).as("__ia")).as("a")
      .join(kept.select(col(keyCol), col(itemCol).as("__ib")).as("b"),
        Seq(keyCol))
      .filter(col("__ia") < col("__ib"))
      .select(col(keyCol),
        col("__ia").as(s"${itemCol}_a"), col("__ib").as(s"${itemCol}_b"))
  }

  /** The keys [[keyedPairs]] would drop at `maxWidth` with their widths —
    * the report surface for the no-silent-caps rule.
    */
  def overWidthKeys(
      items: DataFrame,
      keyCol: String,
      maxWidth: Int): DataFrame =
    items.groupBy(col(keyCol)).agg(count(lit(1)).as("width"))
      .filter(col("width") > maxWidth)
}
