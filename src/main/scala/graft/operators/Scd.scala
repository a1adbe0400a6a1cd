package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 merge — the classic warehouse-ETL
  * operator for versioned dimensions (Kimball SCD2): an incoming snapshot
  * is merged into the current dimension state so that changed rows close
  * out their old version (`valid_to` = load date, `is_current` = false)
  * and open a new one, unchanged rows carry forward untouched, and keys
  * never seen before insert as version 1.
  *
  * Scale design (dimension = billions of rows, delta = the day's
  * changes): the expensive comparisons happen once in a single key-keyed
  * join of base×updates — at 100 TB both sides shuffle on the key (or
  * co-locate for free if the dimension is bucketed by key, §X5). The
  * CHANGED set that drives the close/open split is delta-sized, so the
  * base's close-vs-carry routing is a broadcast semi/anti pair against
  * it — the base is re-scanned but never re-shuffled. No windows, no
  * driver state.
  */
object Scd {

  /** Merge `updates` (an incoming snapshot keyed by `key`, carrying the
    * same `tracked` attribute columns as `base`) into `base` (current
    * dimension state: key, tracked…, version, is_current, valid_from,
    * valid_to). A row counts as changed when ANY tracked column differs
    * null-safely. `loadDate`/`farFuture` are ISO date strings stamped on
    * closed/opened rows.
    */
  def scd2Merge(
      base: DataFrame,
      updates: DataFrame,
      key: String,
      tracked: Seq[String],
      loadDate: String,
      farFuture: String = "9999-12-31"): DataFrame = {

    val anyDiff: Column = tracked
      .map(c => !(col(s"b.$c") <=> col(s"u.$c")))
      .reduce(_ || _)

    // One base×updates join; `changed`/`inserted` are delta-sized.
    val joined = base.alias("b").join(
      updates.alias("u"), col(s"b.$key") === col(s"u.$key"), "full_outer")

    val changed = joined
      .filter(col(s"b.$key").isNotNull && col(s"u.$key").isNotNull && anyDiff)
      .select(col(s"u.$key").as(key) +:
        tracked.map(c => col(s"u.$c").as(c)) :+
        (col("b.version") + 1).as("version"): _*)

    val inserted = joined
      .filter(col(s"b.$key").isNull)
      .select(col(s"u.$key").as(key) +:
        tracked.map(c => col(s"u.$c").as(c)) :+
        lit(1L).as("version"): _*)

    val baseCols = (key +: tracked) ++ Seq("version", "is_current", "valid_from", "valid_to")
    val changedKeys = changed.select(col(key))

    // Delta-sized key set → broadcast; the base scans once, shuffles never.
    val closed = base
      .join(broadcast(changedKeys), Seq(key), "left_semi")
      .withColumn("is_current", lit(false))
      .withColumn("valid_to", lit(loadDate))
      .select(baseCols.map(col): _*)

    val carried = base
      .join(broadcast(changedKeys), Seq(key), "left_anti")
      .select(baseCols.map(col): _*)

    val opened = changed.unionByName(inserted)
      .withColumn("is_current", lit(true))
      .withColumn("valid_from", lit(loadDate))
      .withColumn("valid_to", lit(farFuture))
      .select(baseCols.map(col): _*)

    closed.unionByName(carried).unionByName(opened)
  }

  /** Lift a plain snapshot into SCD2 "current state" shape (version 1,
    * open interval from `since`).
    */
  def asDimension(snapshot: DataFrame, since: String, farFuture: String = "9999-12-31"): DataFrame =
    snapshot
      .withColumn("version", lit(1L))
      .withColumn("is_current", lit(true))
      .withColumn("valid_from", lit(since))
      .withColumn("valid_to", lit(farFuture))
}
