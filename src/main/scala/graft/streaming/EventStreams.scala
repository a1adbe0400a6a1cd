package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming transforms over the event stream (green-field:
  * the reference is batch-only, SURVEY §2.11 — these are the streaming
  * duals of the batch aggregations in SparkEntry, sharing column logic).
  *
  * All operators are expressed on an unbounded DataFrame with an event-time
  * watermark, so state is bounded: late rows beyond the watermark are
  * dropped, window state is evicted once the watermark passes, and
  * `dropDuplicates` keeps only in-watermark keys. The same functions run
  * unchanged on a batch DataFrame (minus the watermark requirement), which
  * is how the specs cross-check them.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with a watermark. */
  def hourlyAggregates(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("total_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(
        col("window.start").as("hour"),
        col("event_type"), col("n"), col("total_value"), col("approx_users"))

  /** Exactly-once event feed: drop duplicate event_ids within the
    * watermark (streaming dedup with bounded state).
    */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Stream-stream interval join (the streaming dual of the batch banded
    * range join): each purchase matched to the same user's view events in
    * the `beforeSeconds` window before it. Both sides carry watermarks
    * AND the join condition bounds event-time distance, so Spark evicts
    * join state once the watermark passes — bounded state on unbounded
    * streams.
    */
  def purchaseAttribution(
      purchases: DataFrame,
      views: DataFrame,
      beforeSeconds: Int = 3600,
      watermark: String = "1 hour"): DataFrame = {
    val v = views.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(v,
        col("view_user") === col("user_id") &&
          col("view_ts") <= col("purchase_ts") &&
          col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $beforeSeconds SECONDS"))
      .select(col("purchase_id"), col("user_id"), col("view_id"))
  }

  /** Sliding-window event rate per type (10-minute windows every 5). */
  def slidingRates(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
}
