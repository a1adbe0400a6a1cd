package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.plans.SpaceSavingCore

/** Continuous per-group heavy hitters: the streaming face of the
  * SpaceSaving batch aggregate (q89). Every micro-batch folds its rows
  * into the group's bounded counter summary and re-emits that group's
  * refreshed top-k — run with Update output mode, the sink always holds
  * the current leaderboard.
  *
  * The counter maintenance is [[graft.plans.SpaceSavingCore]] — the SAME
  * code the batch `TypedImperativeAggregate` runs, so the two paths
  * cannot drift; in the exact regime (distinct values per group within
  * `capacity`) the stream converges to exactly the batch answer (spec
  * cross-checks this). State is O(capacity) per group forever — the
  * property that lets this run unbounded at 100 TB/day.
  */
object StreamingTopK {

  case class KeyedValue(group: String, value: String)
  case class TopEntry(group: String, term: String, cnt: Long, err: Long)
  /** Serializable state mirror of the counter map. */
  case class Summary(entries: Map[String, (Long, Long)])

  def topK(
      values: Dataset[KeyedValue],
      capacity: Int,
      k: Int): Dataset[TopEntry] = {
    import values.sparkSession.implicits._
    def fn(group: String, rows: Iterator[KeyedValue],
        state: GroupState[Summary]): Iterator[TopEntry] = {
      val buf = new java.util.HashMap[String, Array[Long]]()
      state.getOption.foreach(_.entries.foreach { case (t, (c, e)) =>
        buf.put(t, Array(c, e))
      })
      // Deterministic fold order within the slice so batch and
      // micro-batch replays agree even below capacity pressure.
      rows.toSeq.sortBy(_.value).foreach { r =>
        SpaceSavingCore.add(buf, capacity, r.value, 1L, 0L)
      }
      state.update(Summary(SpaceSavingCore.sorted(buf)
        .map { case (t, c, e) => t -> ((c, e)) }.toMap))
      SpaceSavingCore.sorted(buf).take(k).iterator
        .map { case (t, c, e) => TopEntry(group, t, c, e) }
    }
    values.groupByKey(_.group)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
  }
}
