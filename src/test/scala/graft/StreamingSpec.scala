package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** Drive a streaming transform from the sf0.001 events parquet through a
    * memory sink, then cross-check counts against the same transform run
    * in batch — the streaming/batch duality Structured Streaming promises.
    */
  test("hourlyAggregates: streaming matches batch") {
    val batchEvents = Tables.events(spark, sfDir)
    // Stage as a fresh parquet dir with proper µs timestamps (the raw
    // testdata is ns, which the streaming reader also can't take).
    val staged = Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema

    val stream = spark.readStream.schema(schema).parquet(staged)
    val agg = EventStreams.hourlyAggregates(stream)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_out")
      .select("hour", "event_type", "n").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    val batch = EventStreams.hourlyAggregates(batchEvents)
      .select("hour", "event_type", "n").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("dedupedEvents drops in-watermark duplicate event_ids") {
    val events = Tables.events(spark, sfDir)
    val doubled = events.union(events)
    val deduped = EventStreams.dedupedEvents(doubled)
    assert(deduped.count() == events.count())
  }
}
