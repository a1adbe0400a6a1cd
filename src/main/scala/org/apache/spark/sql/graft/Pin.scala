package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage pin for iterative operators (guide §5 "localCheckpoint is a
  * cheaper way to cut lineage", §3.3 "materialising an intermediate
  * truncates the plan").
  *
  * The graph/dedup tier previously pinned per-round state as
  *
  * {{{ spark.createDataFrame(df.localCheckpoint().rdd, df.schema) }}}
  *
  * which truncates lineage and hands every round fresh attribute ids (the
  * self-join requirement), but pays the `.rdd` round trip: the
  * checkpointed UnsafeRows are DESERIALIZED to external `Row`s and
  * RE-ENCODED through a RowEncoder on every consuming job, every round.
  *
  * [[Pin.pin]] keeps the exact plan-shape contract of that idiom — fresh
  * attribute ids, `UnknownPartitioning`, default size statistics (so the
  * optimizer makes the SAME join/exchange choices as before) — while the
  * leaf serves the checkpointed INTERNAL rows directly, with no
  * conversion. A/B on the r12 graph subset: preserving the materialized
  * frame's partitioning/stats instead ([[Pin.pinPartitioned]]) removes
  * per-iteration exchanges, but on the tiny-partition bench it also
  * blocks AQE from coalescing the counterpart side and flips node-sized
  * joins to per-iteration broadcasts — q243/q271/q196 regressed 30-40%,
  * so the neutral form is the default and the partitioned form is opt-in
  * per measured site.
  */
object Pin {

  /** Eagerly materialize `df` and return a fresh-leaf frame over the
    * checkpointed internal rows. Plan-equivalent to
    * `createDataFrame(df.localCheckpoint().rdd, df.schema)` (fresh ids,
    * unknown partitioning, default stats), value-identical, no external
    * Row conversion.
    */
  def pin(df: DataFrame): DataFrame = fresh(df.localCheckpoint())

  /** As [[pin]], but the leaf keeps the materialized plan's output
    * partitioning/ordering and origin statistics — downstream operators
    * keyed the same way skip their Exchange. Use only where measured
    * better: it also pins the partition COUNT (AQE cannot coalesce the
    * other side below it) and makes the frame broadcast-eligible.
    */
  def pinPartitioned(df: DataFrame): DataFrame =
    df.localCheckpoint().queryExecution.analyzed match {
      case l: LogicalRDD =>
        ClassicDataset.ofRows(
          df.sparkSession.asInstanceOf[ClassicSparkSession], l.newInstance())
      case _ => df
    }

  /** Re-key an already-pinned frame's leaf with fresh attribute ids and
    * NEUTRAL planner metadata (unknown partitioning, default stats) —
    * zero data movement; safe per use site when one pinned frame feeds
    * several branches of a self-joining plan.
    */
  def fresh(df: DataFrame): DataFrame = df.queryExecution.analyzed match {
    case l: LogicalRDD =>
      val session = df.sparkSession.asInstanceOf[ClassicSparkSession]
      val out = l.output.map(_.newInstance())
      ClassicDataset.ofRows(session, LogicalRDD(out, l.rdd)(session))
    case _ => df
  }
}
