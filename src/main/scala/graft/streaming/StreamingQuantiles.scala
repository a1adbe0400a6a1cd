package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.DdSketch

/** Streaming quantile monitor — q213's continuous face (21st streaming
  * face): per-key p50/p90 estimates maintained live from a DDSketch
  * bucket-count state.
  *
  * This face exists BECAUSE the sketch is deterministic-mergeable:
  * bucket counts add, so any micro-batch split of the input converges
  * to the batch sketch exactly — NO ordered-arrival contract needed
  * (contrast [[StreamingTransitions]]/[[StreamingAttribution]], whose
  * state is order-sensitive). A t-digest here could only be spec'd
  * approximately; the bucket histogram is spec'd EQUAL.
  *
  * State per key is the bucket-count map — bounded by the value range
  * (~600 buckets for the full double range at α = 1%), independent of
  * row count. Emission recomputes the exact-integer rank walk from the
  * counts, the [[DdSketch.quantileScala]] mirror of the batch column
  * path, so converged emissions equal the declared q213 estimates
  * bit-for-bit (StreamingSpec pins it).
  */
object StreamingQuantiles extends Serializable {

  case class Obs(key: String, value: Double)
  case class QRow(key: String, n: Long, p50_est: Double, p90_est: Double)

  def quantiles(obs: Dataset[Obs], streaming: Boolean): Dataset[QRow] = {
    import obs.sparkSession.implicits._

    def fn(key: String, rows: Iterator[Obs],
        state: GroupState[Map[Long, Long]]): QRow = {
      var counts = state.getOption.getOrElse(Map.empty[Long, Long])
      rows.foreach { o =>
        val idx = DdSketch.bucketIdxScala(o.value)
        counts = counts.updated(idx, counts.getOrElse(idx, 0L) + 1L)
      }
      if (streaming) state.update(counts)
      QRow(key, counts.values.sum,
        DdSketch.quantileScala(counts, 1, 2),
        DdSketch.quantileScala(counts, 9, 10))
    }

    obs.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Adapter: (key, positive value) observations from any frame. */
  def fromColumns(df: DataFrame, keyCol: String, valueCol: String): Dataset[Obs] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string").as("key"),
      col(valueCol).cast("double").as("value")).as[Obs]
  }
}
