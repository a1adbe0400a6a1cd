package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming Benford first-digit audit — q445's continuous face (36th
  * streaming face): live leading-digit counters over order totals, the
  * fraud/anomaly screen run WHILE orders arrive instead of after the
  * fact.
  *
  * Contract: NONE on arrival order — digit counters commute (the
  * checksum class; the spec feeds fully shuffled chunks). State is nine
  * longs total, corpus-size-independent. The rollup runs the SAME
  * finishing math as the declared q445
  * ([[graft.QueriesStats.benfordFinish]]: dense 1–9 grid, shared
  * log₁₀(1+1/d) literals, digit-ordered χ² fold), so converged counters
  * reproduce the batch rows bit for bit.
  */
object StreamingBenford extends Serializable {

  case class DigitEv(digit: Int)
  case class DigitCount(digit: Int, n_obs: Long)

  def counters(evs: Dataset[DigitEv], streaming: Boolean): Dataset[DigitCount] = {
    import evs.sparkSession.implicits._

    def fn(digit: Int, it: Iterator[DigitEv],
        state: GroupState[Long]): DigitCount = {
      var n = state.getOption.getOrElse(0L)
      it.foreach(_ => n += 1)
      if (streaming) state.update(n)
      DigitCount(digit, n)
    }

    evs.groupByKey(_.digit)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Event feed: the leading cents digit per order — q445's observed
    * column replayed as a stream.
    */
  def fromTables(s: SparkSession, dir: String): Dataset[DigitEv] = {
    import s.implicits._
    import graft.QueryDsl.{tbl, dec}
    val cents = (col("o_totalprice").cast(dec) * 100).cast("long")
    tbl(s, dir, "orders")
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .as[DigitEv]
  }

  /** Converged counters → the declared q445 rows, via the SAME finish. */
  def rollup(counts: DataFrame): DataFrame =
    graft.QueriesStats.benfordFinish(
      counts.select(col("digit"), col("n_obs")))
}
