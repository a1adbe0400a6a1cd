package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned table layout — the Iceberg/Delta commit model in
  * miniature: data files are IMMUTABLE and append-only (each ingest
  * batch lands in its own directory), and a table version is nothing
  * but a manifest listing the files visible at that snapshot. That one
  * inversion buys, with no data rewrite:
  *
  *  - **Time travel**: reading version N is reading N's file list.
  *  - **Incremental consumption**: the files in `v_to` minus `v_from`
  *    ARE the change feed between the two snapshots — a downstream
  *    consumer processes exactly the new data, never rescanning the
  *    table (the 100 TB difference between "daily delta" and "daily
  *    full read").
  *  - **Isolation**: a reader holding version N is untouched by later
  *    appends; commits are a manifest write, not a data mutation.
  *
  * Manifests carry per-file `(min_v, max_v, n_rows)` on `statsCol`, so
  * every snapshot read gets [[Layout]]-style file pruning for free.
  * Layout: `<path>/batch-N/` data dirs + `<path>/_manifests/vN.parquet`.
  */
object Snapshots {

  private def manifestDir(path: String) = s"$path/_manifests"

  /** Latest committed version, 0 if none. */
  def currentVersion(path: String): Int = {
    val d = new java.io.File(manifestDir(path))
    if (!d.isDirectory) 0
    else d.listFiles().map(_.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".parquet") =>
        s.stripPrefix("v").stripSuffix(".parquet").toInt }
      .foldLeft(0)(math.max)
  }

  /** Drop all snapshots and data (demo/test hygiene). */
  def reset(path: String): Unit = {
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete(); ()
    }
    rm(new java.io.File(path))
  }

  /** Commit `df` as a new snapshot: write the batch's files (range-
    * clustered on `statsCol` for tight stats), then write manifest
    * `v(N+1)` = previous file list + the new files. Returns the new
    * version. The data write is the only heavy step; the commit itself
    * is one tiny manifest parquet.
    *
    * `commitTag` (e.g. a streaming batch id) rides IN the manifest row
    * for each new file, so "was this batch committed" is answered by the
    * manifest itself — the atomic commit artifact — never by a side
    * marker that could be lost between commit and marker write. A batch
    * directory left by a crashed attempt (data written, manifest commit
    * missed) is unreferenced by any manifest and is overwritten by the
    * retry, so readers never see it twice.
    */
  def append(
      df: DataFrame, path: String, statsCol: String, nFiles: Int,
      commitTag: Option[Long] = None): Int =
    commit(df, path, statsCol, nFiles, commitTag, carryLive = true)

  /** Commit `df` as a FULL-REPLACE snapshot — the Delta/Iceberg
    * "overwrite" commit: the new version's LIVE file set is only this
    * batch's files. Prior manifest rows are carried with `live = false`
    * (data files are immutable, so earlier versions stay readable for
    * time travel, and their `batch_tag`s stay visible to
    * [[committedTags]] for exactly-once replay detection). This is the
    * commit shape a merge/upsert writer needs — e.g. the streaming SCD2
    * dimension updater, where each micro-batch rewrites current state
    * but history must remain queryable by version.
    */
  def replace(
      df: DataFrame, path: String, statsCol: String, nFiles: Int,
      commitTag: Option[Long] = None): Int =
    commit(df, path, statsCol, nFiles, commitTag, carryLive = false)

  private def commit(
      df: DataFrame, path: String, statsCol: String, nFiles: Int,
      commitTag: Option[Long], carryLive: Boolean): Int = {
    val spark = df.sparkSession
    val prev = currentVersion(path)
    val batchDir = s"$path/batch-${prev + 1}"
    df.repartitionByRange(nFiles, col(statsCol))
      .write.mode(SaveMode.Overwrite).parquet(batchDir)
    val newFiles = spark.read.parquet(batchDir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statsCol)).as("min_v"), max(col(statsCol)).as("max_v"),
        count(lit(1)).as("n_rows"))
      .withColumn("batch_tag",
        commitTag.map(lit(_)).getOrElse(lit(null)).cast("long"))
      .withColumn("live", lit(true))
    val manifest =
      if (prev == 0) newFiles
      else {
        val prevM = spark.read.parquet(s"${manifestDir(path)}/v$prev.parquet")
        val prevAdj = if (carryLive) prevM else prevM.withColumn("live", lit(false))
        prevAdj.unionByName(newFiles, allowMissingColumns = true)
      }
    manifest.coalesce(1).write.mode(SaveMode.ErrorIfExists)
      .parquet(s"${manifestDir(path)}/v${prev + 1}.parquet")
    prev + 1
  }

  /** Commit tags present in the latest manifest — the committed-batch
    * set a restarted ingest consults for idempotence.
    */
  def committedTags(spark: SparkSession, path: String): Set[Long] = {
    val v = currentVersion(path)
    if (v == 0) Set.empty
    else {
      val m = spark.read.parquet(s"${manifestDir(path)}/v$v.parquet")
      if (!m.columns.contains("batch_tag")) Set.empty
      else m.select("batch_tag").where(col("batch_tag").isNotNull)
        .distinct().collect().map(_.getLong(0)).toSet
    }
  }

  private def filesAt(spark: SparkSession, path: String, version: Int): Set[String] = {
    require(version >= 1 && version <= currentVersion(path),
      s"no snapshot v$version at $path")
    val m = spark.read.parquet(s"${manifestDir(path)}/v$version.parquet")
    // `live` arrived with replace-commits; rows from append-only
    // manifests (or pre-`live` tables) are live by definition.
    val liveOnly =
      if (m.columns.contains("live")) m.where(coalesce(col("live"), lit(true)))
      else m
    liveOnly.select("file").collect().map(_.getString(0)).toSet
  }

  private def readFiles(spark: SparkSession, path: String, files: Set[String]): DataFrame =
    if (files.isEmpty)
      spark.read.parquet(s"$path/batch-1").limit(0)
    else spark.read.parquet(files.toSeq.sorted: _*)

  /** The table as of snapshot `version` (time travel). */
  def readSnapshot(spark: SparkSession, path: String, version: Int): DataFrame =
    readFiles(spark, path, filesAt(spark, path, version))

  /** Rows added between two snapshots — the incremental change feed;
    * reads ONLY the new files.
    */
  def readIncrement(
      spark: SparkSession, path: String, fromVersion: Int, toVersion: Int): DataFrame = {
    require(fromVersion <= toVersion, "fromVersion must be <= toVersion")
    val from = if (fromVersion == 0) Set.empty[String]
      else filesAt(spark, path, fromVersion)
    readFiles(spark, path, filesAt(spark, path, toVersion) -- from)
  }

  /** Continuous ingest: every micro-batch commits ONE snapshot. The
    * Structured Streaming batch id is recorded INSIDE the manifest
    * commit ([[append]]'s `commitTag`), so idempotence and commit are
    * one atomic artifact: a batch replayed after failure (at-least-once
    * delivery) finds its id in the current manifest and skips — the
    * TABLE sees each batch exactly once, with no window where the data
    * is committed but the dedup record is not. This is the foreachBatch
    * + transactional-sink recipe every lakehouse streaming writer
    * implements; here the "transaction" is the manifest write, which is
    * atomic enough for a single writer.
    *
    * Call `.trigger(...).start()` semantics via the returned writer —
    * the caller controls trigger and await (StreamingSpec drives it with
    * AvailableNow).
    */
  def ingestWriter(
      stream: DataFrame, path: String, statsCol: String, nFiles: Int):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (df: DataFrame, batchId: Long) =>
      if (!committedTags(df.sparkSession, path).contains(batchId)) {
        append(df, path, statsCol, nFiles, commitTag = Some(batchId))
        ()
      }
    }
}
