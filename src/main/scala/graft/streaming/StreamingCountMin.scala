package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.plans.SketchAggregates.CountMinCore

/** Continuous per-group frequency estimates: the streaming face of the
  * count-min batch aggregate (q92). Each micro-batch folds its rows into
  * the group's `depth × width` counter matrix and re-emits the group's
  * refreshed estimates for the tracked probe keys — Update mode, the
  * sink always holds the current frequency table.
  *
  * Counter addressing is [[CountMinCore]] — the same constants the batch
  * `TypedImperativeAggregate` uses — and counter folding is pure
  * addition, so unlike SpaceSaving there is no merge-order subtlety at
  * all: after any partitioning of the input into micro-batches the state
  * EQUALS the batch sketch (spec asserts equality, not convergence).
  * State is O(depth·width) per group forever.
  */
object StreamingCountMin {

  case class KeyedLong(group: String, value: Long)
  case class CmState(counters: Array[Long])
  case class Estimate(group: String, key: Long, est: Long)

  def estimates(
      values: Dataset[KeyedLong],
      width: Int,
      probeKeys: Seq[Long]): Dataset[Estimate] = {
    import values.sparkSession.implicits._
    import CountMinCore._
    def fn(group: String, rows: Iterator[KeyedLong],
        state: GroupState[CmState]): Iterator[Estimate] = {
      val buf = state.getOption.map(_.counters.clone())
        .getOrElse(new Array[Long](Depth * width))
      rows.foreach { r =>
        var i = 0
        while (i < Depth) { buf(i * width + bucket(i, r.value, width)) += 1L; i += 1 }
      }
      state.update(CmState(buf))
      probeKeys.iterator.map { k =>
        var est = Long.MaxValue
        var i = 0
        while (i < Depth) {
          est = math.min(est, buf(i * width + bucket(i, k, width)))
          i += 1
        }
        Estimate(group, k, est)
      }
    }
    values.groupByKey(_.group)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
  }
}
