package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned layout: filters become partition pruning") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/docs"
    val docs = Tables.load(spark, sfDir, "documents")
    Layout.writePartitioned(docs, dir, Seq("lang"))
    // One directory per lang value.
    val langDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langDirs.length >= 3)
    val q = spark.read.parquet(dir).filter($"lang" === "en")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"))
    val full = docs.filter($"lang" === "en").count()
    assert(q.count() == full)
  }

  test("manifest pruning: range probe skips non-overlapping files") {
    val dir = Files.createTempDirectory("graft-manifest").toString + "/events"
    val events = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id", $"value")
    Layout.writeWithManifest(events, dir, "value", nFiles = 8)
    // Range-partitioned on value: a narrow [lo,hi] touches few files.
    val (kept, total) = Layout.pruneStats(spark, dir, 10.0, 20.0)
    assert(total == 8, s"expected 8 data files, manifest has $total")
    assert(kept < total, s"probe should skip files ($kept/$total kept)")
    // And the pruned answer is the full-scan answer.
    val pruned = Layout.prunedRead(spark, dir, "value", 10.0, 20.0)
      .agg(count(lit(1)), sum($"user_id")).as[(Long, Long)].head()
    val full = events.filter($"value".between(10.0, 20.0))
      .agg(count(lit(1)), sum($"user_id")).as[(Long, Long)].head()
    assert(pruned == full)
    // Empty overlap degrades to an empty typed frame, not an error.
    assert(Layout.prunedRead(spark, dir, "value", 1e9, 2e9).count() == 0)
  }

  test("bloom manifest: point probe skips files min/max cannot") {
    val dir = Files.createTempDirectory("graft-bloom").toString + "/events"
    val events = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id", $"value")
    Layout.writeWithBloomManifest(events, dir, "user_id", nFiles = 16)
    val (kept, total) = Layout.pruneStatsPoint(spark, dir, 3L)
    // Empty hash partitions write no file, so total can land under 16.
    assert(total >= 8, s"expected several data files, manifest has $total")
    // Hash partitioning puts the probed user in ONE file; bloom false positives
    // may admit a few more, but most files are provably skipped.
    assert(kept <= total / 2, s"point probe kept $kept/$total files")
    val pruned = Layout.prunedPointRead(spark, dir, "user_id", 3L)
      .agg(count(lit(1)), sum($"value")).as[(Long, Double)].head()
    val full = events.filter($"user_id" === 3L)
      .agg(count(lit(1)), sum($"value")).as[(Long, Double)].head()
    assert(pruned == full)
    // Absent key: every file provably lacks it -> empty frame, no error.
    assert(Layout.prunedPointRead(spark, dir, "user_id", 999999L).count() == 0)
  }

  test("compaction: fewer files, manifest rebuilt, pruned answers unchanged") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/events"
    val events = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id", $"value")
    Layout.writeWithManifest(events, dir, "value", nFiles = 16)
    val before = Layout.prunedRead(spark, dir, "value", 10.0, 20.0)
      .agg(count(lit(1)), sum($"user_id")).as[(Long, Long)].head()
    Layout.compact(spark, dir, "value", nFiles = 4)
    val (_, total) = Layout.pruneStats(spark, dir, 10.0, 20.0)
    assert(total == 4, s"compaction should leave 4 files, manifest has $total")
    val after = Layout.prunedRead(spark, dir, "value", 10.0, 20.0)
      .agg(count(lit(1)), sum($"user_id")).as[(Long, Long)].head()
    assert(after == before)
    // The rewritten manifest points at live files (a stale path would
    // blow up the read above, but assert directly for a clear failure).
    val files = spark.read.parquet(s"$dir.manifest")
      .select("file").as[String].collect()
    assert(files.forall(f => new java.io.File(
      f.stripPrefix("file:")).exists()))
  }

  test("bucketed tables join with no exchange on either side") {
    val events = Tables.events(spark, sfDir)
    val a = events.select($"event_id", $"user_id", $"value")
    val b = events.select($"event_id", $"event_type")
    Layout.writeBucketed(a, spark, "bkt_a", "event_id", nBuckets = 8)
    Layout.writeBucketed(b, spark, "bkt_b", "event_id", nBuckets = 8)
    // Disable auto-broadcast: at test scale Spark would broadcast the
    // small side and never exercise the bucketed path a fact-fact join
    // takes at real scale.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a")
        .join(spark.table("bkt_b"), Seq("event_id"))
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // The write-time bucketing IS the shuffle: the join runs as a
      // sort-merge over matching buckets with NO Exchange on either
      // input; the only one left is what the group-by on a different
      // key genuinely needs.
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
        s"unexpected shuffle exchanges:\n$plan")
      assert(plan.contains("Bucketed: true"))
      assert(joined.agg(sum($"n")).as[Long].head() == events.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hive partitioning turns the type filter into partition pruning") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    val events = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id", $"value")
    Layout.writePartitioned(events, dir, Seq("event_type"))
    val q = spark.read.parquet(dir).filter($"event_type" === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*event_type[^\\]]*\\].*"),
      s"filter did not reach partition level:\n$plan")
    assert(q.count() == events.filter($"event_type" === "purchase").count())
  }

  test("compaction survives regex metacharacters in the table path") {
    // `$` in the replacement side of regexp_replace reads as a group ref
    // unless quoted — a path like this used to corrupt the manifest.
    val dir = Files.createTempDirectory("graft-c$0mp").toString + "/ev$1ents"
    val events = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id", $"value").limit(1000)
    Layout.writeWithManifest(events, dir, "value", nFiles = 8)
    Layout.compact(spark, dir, "value", nFiles = 2)
    val files = spark.read.parquet(s"$dir.manifest")
      .select("file").as[String].collect()
    assert(files.nonEmpty && files.forall(f =>
      f.contains("ev$1ents") &&
        new java.io.File(f.stripPrefix("file:")).exists()))
    assert(Layout.prunedRead(spark, dir, "value", Double.MinValue, Double.MaxValue)
      .count() == 1000)
  }

  test("z-order layout: 2-D box probe prunes files on both dimensions") {
    val dir = Files.createTempDirectory("graft-zorder").toString + "/events"
    val events = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id", $"value")
    Layout.writeZOrdered(events, dir, "user_id", "value", nFiles = 16)
    val (kept, total) = Layout.pruneStatsBox(spark, dir, 10L, 40L, 20.0, 60.0)
    assert(total == 16, s"expected 16 data files, manifest has $total")
    // A ~quarter-area box on a Morton layout should skip most files —
    // range-partitioning on one column alone could never prune the other.
    assert(kept <= total / 2, s"box probe kept $kept/$total files")
    val pruned = Layout.prunedReadBox(
        spark, dir, "user_id", 10L, 40L, "value", 20.0, 60.0)
      .agg(count(lit(1)), sum($"user_id")).as[(Long, Long)].head()
    val full = events
      .filter($"user_id".between(10L, 40L) && $"value".between(20.0, 60.0))
      .agg(count(lit(1)), sum($"user_id")).as[(Long, Long)].head()
    assert(pruned == full)
  }

  test("zValue is a bijection from the coordinate grid onto [0, 4^bits)") {
    val grid = spark.range(0, 64).selectExpr("id % 8 AS a", "id div 8 AS b")
    val zs = grid.select(Layout.zValue($"a", $"b", 3).as("z"))
      .as[Long].collect().sorted.toSeq
    // 64 distinct cells -> 64 distinct z-values covering 0..63 exactly.
    assert(zs == (0L until 64L))
  }

  test("bucketed tables join with no exchange") {
    val o = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    Layout.writeBucketed(o, spark, "orders_b", "o_orderkey", 4)
    Layout.writeBucketed(
      li.withColumnRenamed("l_orderkey", "o_orderkey"), spark, "lineitem_b",
      "o_orderkey", 4)
    // Disable auto-broadcast so the plan exercises the bucketed sort-merge
    // path (at 100 TB neither side broadcasts — that is the case bucketing
    // exists for).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning") &&
        !plan.contains("ShuffleExchange"),
        s"bucketed join should be shuffle-free, got:\n${plan.take(800)}")
      assert(joined.count() ==
        o.join(li, o("o_orderkey") === li("l_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("prepareOnce is a synchronization barrier: one write, losers block") {
    import graft.sources.Layout
    val key = s"layout-spec-barrier-${System.nanoTime()}"
    val start = new java.util.concurrent.CountDownLatch(1)
    val writes = new java.util.concurrent.atomic.AtomicInteger(0)
    val observed = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Int]())
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        start.await()
        Layout.prepareOnce(key) { Thread.sleep(100); writes.incrementAndGet() }
        // After prepareOnce returns, the winner's write MUST be complete —
        // a loser returning early would read 0 here.
        observed.add(writes.get())
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    assert(writes.get() == 1)
    assert(observed.size == 4)
    observed.forEach(v => assert(v == 1))
  }
}
