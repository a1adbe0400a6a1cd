package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Continuous funnel tracking — the streaming face of the batch funnel
  * (q104): per-user state holds the first-occurrence timestamp of each
  * funnel step; every micro-batch folds its events in (min is
  * order-insensitive, so ANY batch split converges to the batch answer)
  * and re-emits the user's current stage. Update mode: the sink always
  * holds each user's latest funnel position.
  *
  * State is three optional longs per user — bounded forever, no
  * timeout needed for the analytic itself (add
  * `GroupStateTimeout.EventTimeTimeout` + a watermark upstream to expire
  * dormant users at 100 TB/day cardinalities).
  */
object StreamingFunnel extends Serializable {

  case class Event(user_id: Long, event_type: String, ts_micros: Long)
  case class FunnelState(
      firstView: Long, firstClick: Long, firstPurchase: Long)
  case class StageRow(user_id: Long, stage: String)

  private val None_ = Long.MaxValue

  /** Same classification as the batch q104 CASE — keep in sync. */
  def classify(v: Long, c: Long, p: Long): String =
    if (v == None_) "no_view"
    else if (c == None_ || c <= v) "view"
    else if (p == None_ || p <= c) "view_click"
    else "view_click_purchase"

  def stages(events: Dataset[Event]): Dataset[StageRow] = {
    import events.sparkSession.implicits._
    def fn(user: Long, rows: Iterator[Event],
        state: GroupState[FunnelState]): StageRow = {
      var s = state.getOption.getOrElse(FunnelState(None_, None_, None_))
      rows.foreach { e =>
        e.event_type match {
          case "view" => s = s.copy(firstView = math.min(s.firstView, e.ts_micros))
          case "click" => s = s.copy(firstClick = math.min(s.firstClick, e.ts_micros))
          case "purchase" =>
            s = s.copy(firstPurchase = math.min(s.firstPurchase, e.ts_micros))
          case _ => ()
        }
      }
      state.update(s)
      StageRow(user, classify(s.firstView, s.firstClick, s.firstPurchase))
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }
}
