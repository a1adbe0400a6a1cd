package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Scd
import graft.sources.Snapshots

/** Streaming SCD Type-2 dimension maintenance — the 18th streaming face:
  * a stream of update snapshots (key + tracked attributes, key-unique
  * per micro-batch; callers dedup first) merges into a versioned
  * dimension table, one [[Snapshots.replace]] commit per micro-batch.
  *
  * The composition is exactly batch SCD2 ([[Scd.scd2Merge]] — identical
  * close/open/carry/insert semantics, so stream-applied batches equal
  * the same merges applied in batch) plus the lakehouse upsert-sink
  * recipe: foreachBatch, with the streaming batch id riding in the
  * manifest commit. Exactly-once matters MORE for a merge sink than an
  * append sink — replaying an old update batch against a newer state is
  * not idempotent (it would "change" values back) — and replace-commits
  * carry prior manifests' `batch_tag`s forward (`live = false` rows), so
  * a replayed batch is detected and skipped even though its files are no
  * longer live. Dimension history stays queryable:
  * `Snapshots.readSnapshot(table, v)` is the dimension AS OF commit v —
  * the time-travel side of the q162 point-in-time join.
  *
  * Scale: per micro-batch cost is one delta×dimension key join plus a
  * dimension rewrite — the standard lakehouse SCD2 tradeoff (Delta MERGE
  * does the same rewrite, file-pruned). At 100 TB dimensions the rewrite
  * narrows to touched partitions when the table is key-partitioned;
  * the merge logic is unchanged.
  */
object StreamingScd {

  /** foreachBatch writer merging each micro-batch into the SCD2
    * dimension at `table`. `loadDateOf` maps the batch id to the ISO
    * load date stamped on that batch's closed/opened rows (injectable
    * for deterministic tests; defaults to day offsets from an epoch).
    */
  def upsertWriter(
      updates: DataFrame,
      table: String,
      key: String,
      tracked: Seq[String],
      nFiles: Int = 2,
      loadDateOf: Long => String = id =>
        java.time.LocalDate.of(2026, 1, 1).plusDays(id).toString):
      DataStreamWriter[Row] =
    updates.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      if (!Snapshots.committedTags(spark, table).contains(batchId)) {
        val v = Snapshots.currentVersion(table)
        val current =
          if (v == 0) Scd.asDimension(batch.limit(0), loadDateOf(batchId))
          else Snapshots.readSnapshot(spark, table, v)
        val merged = Scd.scd2Merge(current, batch, key, tracked, loadDateOf(batchId))
        Snapshots.replace(merged, table, key, nFiles, commitTag = Some(batchId))
        ()
      }
    }
}
