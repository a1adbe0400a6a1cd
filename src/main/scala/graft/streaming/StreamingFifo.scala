package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming FIFO lot allocation — q242's continuous face (24th
  * streaming face): each user's credit-lot allocation is maintained
  * live as signups and purchases arrive, instead of recomputing the
  * interval-overlap join over the full history.
  *
  * Contract: per-key (per-user) ordered arrival across micro-batches
  * (the keyed-Kafka/CDC guarantee; rows inside a batch may arrive
  * unordered — the group fn sorts by (us, event_id)). Under it, the
  * per-user snapshot equals the batch q242 row over the same prefix.
  *
  * State per user: the three cumulative counters plus the FIFO queue of
  * purchases not yet fully funded — O(outstanding purchases), the
  * honest working set of FIFO matching (a fully-funded purchase leaves
  * state forever; a fully-consumed lot is just a number). Every match
  * q242's interval join would emit is produced incrementally: a
  * purchase matches the lots its interval already overlaps; a new lot
  * matches the queued purchases overlapping [totalIn, totalIn+L).
  */
object StreamingFifo extends Serializable {

  val LotCents = 10000L

  case class Ev(user_id: Long, event_id: Long, event_type: String,
      us: Long, cents: Long)

  /** Queued purchase interval on the user's cumulative-outflow line. */
  case class Pending(out_lo: Long, out_hi: Long)

  case class FifoState(totalIn: Long, totalOut: Long, nLots: Long,
      nPurchases: Long, nMatches: Long, fundedCents: Long,
      pending: List[Pending],
      lastUs: Long = Long.MinValue, lastEid: Long = Long.MinValue)

  case class FifoRow(user_id: Long, n_lots: Long, n_purchases: Long,
      n_matches: Long, funded_cents: Long, outstanding: Long)

  private val empty = FifoState(0L, 0L, 0L, 0L, 0L, 0L, Nil)

  private def onPurchase(s: FifoState, cents: Long): FifoState = {
    val lo = s.totalOut
    val hi = s.totalOut + cents
    val span = math.min(hi, s.totalIn) - lo
    val (matches, funded) =
      if (span > 0) {
        val firstLot = lo / LotCents
        val lastLot = (math.min(hi, s.totalIn) + LotCents - 1) / LotCents
        (lastLot - firstLot, span)
      } else (0L, 0L)
    val pending =
      if (hi > s.totalIn) s.pending :+ Pending(lo, hi) else s.pending
    s.copy(totalOut = hi, nPurchases = s.nPurchases + 1,
      nMatches = s.nMatches + matches, fundedCents = s.fundedCents + funded,
      pending = pending)
  }

  private def onLot(s: FifoState): FifoState = {
    val tin = s.totalIn
    val hiL = tin + LotCents
    var matches = 0L
    var funded = 0L
    val remaining = s.pending.flatMap { p =>
      if (p.out_lo < hiL) {
        matches += 1
        funded += math.min(p.out_hi, hiL) - math.max(p.out_lo, tin)
        if (p.out_hi > hiL) Some(p) else None
      } else Some(p)
    }
    s.copy(totalIn = hiL, nLots = s.nLots + 1, nMatches = s.nMatches + matches,
      fundedCents = s.fundedCents + funded, pending = remaining)
  }

  def allocate(events: Dataset[Ev], streaming: Boolean): Dataset[FifoRow] = {
    import events.sparkSession.implicits._

    def fn(user: Long, rows: Iterator[Ev],
        state: GroupState[FifoState]): FifoRow = {
      var s = state.getOption.getOrElse(empty)
      val sorted = rows.toSeq.sortBy(e => (e.us, e.event_id))
      // Ordered-arrival state guard (r11 drill, per-EVENT since r12):
      // FIFO matching is order-DEFINED, so a cross-batch replay, late
      // event, OR an exact intra-batch duplicate (same (us, event_id)
      // twice in one slice — sort hides it from a head-only check but
      // the fold would double-allocate lots) fails loudly.
      sorted.foreach { e =>
        if (s.lastUs != Long.MinValue &&
            Ordering[(Long, Long)].lteq((e.us, e.event_id), (s.lastUs, s.lastEid)))
          throw new IllegalStateException(
            s"ordered-arrival contract violated for user $user: event " +
              s"(us=${e.us}, id=${e.event_id}) arrived after state had " +
              s"folded (us=${s.lastUs}, id=${s.lastEid})")
        e.event_type match {
          case "signup"   => s = onLot(s)
          case "purchase" => s = onPurchase(s, e.cents)
          case _          => ()
        }
        s = s.copy(lastUs = e.us, lastEid = e.event_id)
      }
      if (streaming) state.update(s)
      FifoRow(user, s.nLots, s.nPurchases, s.nMatches, s.fundedCents,
        s.pending.size.toLong)
    }

    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Adapter: signup/purchase events with exact integer cents (the q242
    * cast), read through [[graft.Tables.events]].
    */
  def fromEvents(df: DataFrame): Dataset[Ev] = {
    import df.sparkSession.implicits._
    df.filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"))
      .as[Ev]
  }
}
