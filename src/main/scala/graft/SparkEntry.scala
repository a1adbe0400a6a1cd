package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Ids, Redaction, Text, Vectors}
import graft.operators.{Dedup, Relational, Sampling, Similarity}

/** Driver contract: `queries` is the operator inventory (SURVEY.md §2 +
  * the beyond-parity training-data operators), each with a DuckDB oracle
  * in `oracleSql` computing the same result with the same column names.
  *
  * Cross-engine determinism rules used throughout (so value hashes match):
  *  - money/quantity aggregates go through DECIMAL(18,2) casts → exact
  *    arithmetic, no float-summation-order divergence;
  *  - aggregate RESULT types are canonicalized on BOTH sides: integer sums
  *    stay BIGINT (DuckDB widens to HUGEINT, so the oracle wraps
  *    `CAST(... AS BIGINT)`); decimal sums are emitted as DOUBLE (DuckDB
  *    widens DECIMAL(18,2) to DECIMAL(38,2), Spark to DECIMAL(28,2); both
  *    convert to the same IEEE double while the exact cents fit in 2^53).
  *    Without this, readers that coerce HUGEINT/DECIMAL to float64 see
  *    57059.0 vs 57059 and the value hash diverges;
  *  - ratios are computed as ONE double division of exact integers/decimals;
  *  - hashes that must agree across engines use md5 (hex of UTF-8 bytes);
  *  - every computed column is aliased identically on both sides.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val dec = "decimal(18,2)"

  /** Expected size of [[queries]]/[[oracleSql]] — bumped ONLY by a human
    * adding a query. RegistrySpec asserts both maps match this count and
    * each other, so a query silently vanishing between rounds (as
    * q42/q58's r5 absence did) fails the build instead of shrinking the
    * correctness gate without a red signal.
    */
  val declaredQueryCount = 204

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    revenueByNation(spark, "/root/testdata/sf0.001")

  /** TPC-H-Q5-style revenue-per-nation: fact-side multi-join with
    * broadcast dims + FK resolution via [[Relational.transformToFk]].
    */
  private def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
    val o = tbl(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1996-01-01"))
    val c = tbl(s, dir, "customer")
    val n = tbl(s, dir, "nation")
    val withNation =
      Relational.transformToFk(c, n, "c_nationkey", "n_nationkey", "n_name", "nation_name")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(withNation, o("o_custkey") === withNation("c_custkey"))
      .groupBy(col("nation_name"))
      .agg(
        sum((col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount")).cast(dec)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items")
      )
  }

  private val discPrice: Column =
    col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount")).cast(dec)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Aggregations (SURVEY §2.4) ──────────────────────────────────────
    "q01_pricing_summary" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order")
        )
    }),
    "q02_fk_dim_join" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      val n = tbl(s, dir, "nation")
      val r = tbl(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast(dec)).cast("double").as("total_acctbal")
        )
    }),
    "q03_revenue_by_nation" -> ((s, dir) => revenueByNation(s, dir)),
    "q85_bloom_pruned_join" -> ((s, dir) => {
      // Runtime-filter pattern as an explicit operator: a distributed
      // bloom of the dim keys (one OR-merged bitset row), broadcast and
      // applied to the fact scan as a codegen'd predicate BEFORE the join
      // shuffle. False positives die in the join, so the oracle is the
      // plain join.
      val dim = tbl(s, dir, "part").filter(col("p_size") === 1)
        .select(col("p_partkey"), col("p_brand"))
      val fact = tbl(s, dir, "lineitem").select(col("l_partkey"), col("l_quantity"))
      graft.operators.BloomJoin
        .prunedJoin(fact, "l_partkey", dim, "p_partkey", numBits = 1 << 18)
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"))
    }),
    "q10_collect_set" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          count(lit(1)).as("n_orders")
        )
    }),
    "q11_conditional_agg" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_discount") > 0, 1).otherwise(0)).as("n_discounted"),
          sum(when(col("l_tax") === 0, 1).otherwise(0)).as("n_taxfree"),
          count(lit(1)).as("n_total")
        )
    }),
    "q44_pivot" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("O", "F", "P"))
        .withColumnRenamed("O", "n_open")
        .withColumnRenamed("F", "n_finished")
        .withColumnRenamed("P", "n_pending")
    }),

    // ── Joins (SURVEY §2.3) ─────────────────────────────────────────────
    "q04_anti_join" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q05_semi_join" -> ((s, dir) => {
      val p = tbl(s, dir, "part")
      val li = tbl(s, dir, "lineitem").filter(col("l_discount") > 0.07)
      p.join(li, p("p_partkey") === li("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"))
    }),
    "q06_full_outer" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_orders"))
      val l = tbl(s, dir, "lineitem")
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_ships"))
      o.join(l, o("day") === l("day"), "full_outer")
        .select(
          coalesce(o("day"), l("day")).as("day"),
          coalesce(col("n_orders"), lit(0)).as("n_orders"),
          coalesce(col("n_ships"), lit(0)).as("n_ships")
        )
    }),
    "q07_self_join" -> ((s, dir) => {
      val a = tbl(s, dir, "nation").select(
        col("n_regionkey").as("rk"), col("n_name").as("nation_a"))
      val b = tbl(s, dir, "nation").select(
        col("n_regionkey").as("rk"), col("n_name").as("nation_b"))
      a.join(b, Seq("rk"))
        .filter(col("nation_a") < col("nation_b"))
        .select(col("rk").as("region_key"), col("nation_a"), col("nation_b"))
    }),
    "q08_expr_join" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val dim = o
        .select(concat(col("o_orderstatus"), lit("|"), col("o_orderpriority")).as("class_key"))
        .distinct()
        .withColumn("class_id", Ids.denseId(col("class_key")))
      o.join(
          broadcast(dim),
          concat(col("o_orderstatus"), lit("|"), col("o_orderpriority")) === dim("class_key")
        )
        .groupBy(col("class_id"), col("class_key"))
        .agg(count(lit(1)).as("n_orders"))
    }),
    "q09_exactly_one" -> ((s, dir) => {
      val p = tbl(s, dir, "part")
      val ps = tbl(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey")).distinct()
      Relational.exactlyOneJoin(p, ps, "p_partkey", "l_partkey")
        .select(col("p_partkey"), col("p_name"), col("l_suppkey").as("sole_suppkey"))
    }),
    "q29_nullsafe_join" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
        .withColumn("pk", when(col("o_orderstatus") === "O", lit(null).cast("string"))
          .otherwise(col("o_orderstatus")))
      val a = o.groupBy(col("pk")).agg(count(lit(1)).as("n_a"))
      val b = o.groupBy(col("pk"))
        .agg(sum(col("o_totalprice").cast(dec)).cast("double").as("total_b"))
      Relational.nullSafeJoin(a, b, Seq("pk"), "inner")
        .select(a("pk").as("status_key"), col("n_a"), col("total_b"))
    }),
    "q28_sorted_array_join" -> ((s, dir) => {
      val p = tbl(s, dir, "part")
        .select(col("p_partkey"), split(col("p_name"), " ").as("words"))
      val grouped = p
        .groupBy(sort_array(col("words")).as("word_bag"))
        .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("min_partkey"))
        .filter(col("n_parts") > 1)
        .select(concat_ws(" ", col("word_bag")).as("word_bag"), col("n_parts"), col("min_partkey"))
      grouped
    }),

    // ── Windows (SURVEY §2.5) ───────────────────────────────────────────
    "q12_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }),
    "q13_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 5)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity").cast(dec)).over(w).cast("double").as("running_qty")
        )
    }),

    // ── Projections / filters / recodes (SURVEY §2.2) ───────────────────
    "q14_recode" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .withColumn("size_class",
          when(col("o_totalprice") < 1000, "small")
            .when(col("o_totalprice") < 10000, "medium")
            .when(col("o_totalprice") < 100000, "large")
            .otherwise("jumbo"))
        .groupBy(col("size_class"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
    }),
    "q15_distinct" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .dropDuplicates()
    }),
    "q23_topk" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),
    "q25_dense_id" -> ((s, dir) => {
      tbl(s, dir, "part")
        .select(col("p_brand")).distinct()
        .withColumn("brand_id", Ids.denseId(col("p_brand")))
    }),
    "q26_binning" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 1000, "0-1k")
            .when(col("o_totalprice") < 10000, "1k-10k")
            .when(col("o_totalprice") < 100000, "10k-100k")
            .otherwise("100k+"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
    }),
    "q22_null_handling" -> ((s, dir) => {
      val d = when(col("l_discount") === 0, lit(null).cast("double"))
        .otherwise(col("l_discount"))
      tbl(s, dir, "lineitem")
        .withColumn("d", d)
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("d").isNull.cast("long")).as("n_null"),
          count(col("d")).as("n_nonnull"),
          sum(col("d").cast(dec)).cast("double").as("sum_disc")
        )
    }),

    // ── Set operations & arrays (SURVEY §2.7) ───────────────────────────
    "q16_union" -> ((s, dir) => {
      val c = tbl(s, dir, "customer").select(
        col("c_name").as("entity_name"), lit("customer").as("kind"),
        col("c_acctbal").as("acctbal"))
      val sp = tbl(s, dir, "supplier").select(
        lit("supplier").as("kind"), col("s_name").as("entity_name"),
        col("s_acctbal").as("acctbal"))
      c.unionByName(sp)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("acctbal").cast(dec)).cast("double").as("total_acctbal"))
    }),
    "q17_array_ops" -> ((s, dir) => {
      val words = split(col("p_name"), " ")
      tbl(s, dir, "part").select(
        col("p_partkey"),
        concat_ws(" ", sort_array(array_except(words, array(lit("small"), lit("red")))))
          .as("kept_words"),
        size(array_intersect(words, array(lit("small"), lit("red"), lit("blue"))))
          .as("n_marked")
      )
    }),

    // ── Scalar functions (SURVEY §2.8) ──────────────────────────────────
    "q18_string_funcs" -> ((s, dir) => {
      tbl(s, dir, "customer").select(
        col("c_custkey"),
        upper(trim(col("c_name"))).as("name_upper"),
        replace(lower(col("c_mktsegment")), lit("a"), lit("@")).as("seg_coded"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).as("name_len")
      )
    }),
    "q19_regexp" -> ((s, dir) => {
      tbl(s, dir, "customer").select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)$", 1).as("cust_num"),
        regexp_replace(col("c_mktsegment"), "[AEIOU]", "_").as("seg_novowel")
      )
    }),
    "q20_explode_wordcount" -> ((s, dir) => {
      tbl(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)
    }),
    "q21_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k_val")).as("sum_k"), max(col("k_val")).as("max_k"),
          count(lit(1)).as("n"))
    }),
    "q24_hourly_events" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
    }),
    "q42_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev"))) > 1800L * 1000000L, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // ── Dedup operators (beyond-parity, on documents) ───────────────────
    "q30_exact_dedup" -> ((s, dir) =>
      Dedup.exactClusters(tbl(s, dir, "documents"), "doc_id", "text")),
    "q31_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashCandidatePairs(tbl(s, dir, "documents"), "doc_id", "text",
        k = 8, bands = 2, shingleN = 3)),
    "q32_simhash" -> ((s, dir) =>
      tbl(s, dir, "documents").select(
        col("doc_id"),
        graft.plans.TextKernels.simhash16Native(col("text")).as("simhash"))),
    "q33_ngram_jaccard" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      val a = d.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
      val b = d.select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"),
        col("toks").as("toks_b"))
      a.join(b, Seq("id_a"))
        .select(col("id_a"), col("id_b"),
          Text.jaccard(col("toks_a"), col("toks_b")).as("jaccard"))
    }),
    "q34_fingerprint" -> ((s, dir) =>
      Dedup.fingerprintClusters(tbl(s, dir, "documents"), "doc_id", "text")),
    "q90_incremental_dedup" -> ((s, dir) => {
      // Rolling-ingestion dedup: a 10% shard (doc_id % 10 = 0, SF-
      // proportional) against the remaining corpus, via one anti-join on
      // the bag fingerprint — per-shard cost is independent of corpus
      // size once the fingerprint index is persisted.
      val docs = tbl(s, dir, "documents")
      graft.operators.Dedup.incrementalDedup(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text")
    }),

    // ── End-to-end curation + near-dup clustering (beyond-parity) ───────
    "q71_curation" -> ((s, dir) => {
      // The composed training-data curation pass: language-consistency
      // filter + quality threshold + exact dedup keep-min-id. One scan,
      // one groupBy shuffle, one semi join.
      val toks = Text.tokens(col("text"))
      val scored = tbl(s, dir, "documents").select(
        col("doc_id"), col("text"),
        Text.langIdByStopwords(toks, langMarkers).as("pred_lang"),
        Text.qualityScore(col("text"), toks).as("quality_score"),
        col("lang"))
      val filtered = scored
        .filter(col("quality_score") >= 40 && col("pred_lang") === col("lang"))
      val keep = filtered
        .groupBy(Text.md5Hex(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      filtered.join(keep, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("pred_lang"), col("quality_score"))
    }),
    "q72_neardup_components" -> ((s, dir) => {
      // LSH-bucketed near-dup pairs → connected components: the cluster
      // assignment a dedup pipeline uses to keep one doc per near-dup
      // group. Label propagation rounds = cluster diameter.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val pairs = Similarity.nearDuplicatePairs(e, "vec_id", "embedding",
        nPlanes = 4, dim = dim, threshold = 0.3).select("id_a", "id_b")
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .withColumnRenamed("vertex", "vec_id")
    }),

    "q73_salted_agg" -> ((s, dir) => {
      // Two-phase salted aggregation (skew path): partial counts per
      // (key, salt), then re-aggregate — same result as a plain groupBy,
      // but a hot key spreads over `salts` reducers.
      graft.operators.Skew.saltedCount(
        tbl(s, dir, "lineitem").select(col("l_returnflag")),
        "l_returnflag", salts = 16)
    }),
    "q74_media_features" -> ((s, dir) => {
      // Multimodal plumbing end-to-end: text payloads as opaque binary,
      // per-partition decoder (mapPartitions = the mapInPandas shape).
      // The oracle checks the full row/byte contract; the stub codec's
      // feature VALUES are engine-internal (wraparound hash arithmetic).
      import s.implicits._
      val media = tbl(s, dir, "documents").select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"), lit(0).as("width"), lit(0).as("height"))
        .as[graft.multimodal.Multimodal.MediaRow]
      graft.multimodal.Multimodal.extractFeatures(media, dim = 4)
        .select(col("media_id"), col("mime"), col("n_bytes"),
          size(col("features")).as("n_features"))
    }),

    "q91_audio_decode" -> ((s, dir) => {
      // REAL audio codec on the verified surface (q81's pattern for
      // audio): per row, an 8-bit unsigned PCM WAV with samples
      // alternating 128±a is written via javax.sound and decoded back;
      // normalized math is exact for integer a over the power-of-two PCM
      // range, so rms = a/128 and zero_crossings = n-1 EXACTLY — pure
      // arithmetic on the DuckDB side.
      import s.implicits._
      val media = tbl(s, dir, "part").filter(col("p_partkey") < 24)
        .select(col("p_partkey").cast("long").as("id")).as[Long]
        .map { id =>
          val a = (id * 7 % 120 + 1).toInt
          val n = (50 + id % 10).toInt
          val pcm = new Array[Byte](n)
          var i = 0
          while (i < n) {
            pcm(i) = (if (i % 2 == 0) 128 + a else 128 - a).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          graft.multimodal.Multimodal.MediaRow(id, bos.toByteArray, "audio/wav", 0, 0)
        }
      graft.multimodal.AudioCodec.extractAudioFeatures(media)
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          col("rms"), col("zero_crossings"))
    }),
    "q81_image_decode" -> ((s, dir) => {
      // REAL image codec on the verified surface: solid-gray 8×8 PNGs are
      // encoded per row (gray = key*10 mod 256), decoded back through
      // ImageIO, and the luminance-grid features must recover the gray
      // value EXACTLY — an oracle can predict the round-trip with pure
      // arithmetic, no image library needed on the DuckDB side.
      import s.implicits._
      val media = tbl(s, dir, "part").filter(col("p_partkey") < 24)
        .select(col("p_partkey").cast("long").as("id"),
          (col("p_partkey") * 10 % 256).cast("int").as("gray"))
        .as[(Long, Int)]
        .map { case (id, g) =>
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < 8) { var x = 0; while (x < 8) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          graft.multimodal.Multimodal.MediaRow(id, bos.toByteArray, "image/png", 8, 8)
        }
      graft.multimodal.ImageCodec.extractImageFeatures(media, gridDim = 2)
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("features"), 1) * 255, 0).cast("int")
            .as("gray_decoded"))
    }),

    "q96_profile" -> ((s, dir) =>
      // One-scan column profiler (Expand-planned multi-countDistinct):
      // the pre-curation "describe" pass. Doubles stay out of the
      // profile set — their string rendering is engine-specific; every
      // other type renders identically cross-engine.
      graft.operators.Profile.profile(
        tbl(s, dir, "orders"),
        Seq("o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate"))),

    "q95_video_frames" -> ((s, dir) => {
      // REAL per-frame video decode over the GVID frame container:
      // variable-length videos of solid-gray PNG frames
      // (gray = (id*10 + idx*40) mod 256), stride-2 sampling inside the
      // demux loop, ImageIO decode per sampled frame. The luminance grid
      // must recover each frame's gray EXACTLY, so the oracle is pure
      // arithmetic over (id, sampled idx) — the q81 pattern lifted to
      // one-row-per-frame.
      import s.implicits._
      val media = tbl(s, dir, "part").filter(col("p_partkey") < 24)
        .select(col("p_partkey").cast("long").as("id"))
        .as[Long]
        .map { id =>
          val frames = (0 until ((id % 4) + 2).toInt).map { idx =>
            val g = ((id * 10 + idx * 40) % 256).toInt
            val img = new java.awt.image.BufferedImage(
              8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val rgb = (g << 16) | (g << 8) | g
            var y = 0
            while (y < 8) { var x = 0; while (x < 8) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          }
          graft.multimodal.Multimodal.MediaRow(
            id, graft.multimodal.VideoCodec.encode(frames), "video/x-gvid", 8, 8)
        }
      graft.multimodal.VideoCodec.sampleFrameFeatures(media, every = 2, gridDim = 2)
        .select(col("media_id"), col("frame_idx"), col("n_frames"),
          col("width"), col("height"),
          round(element_at(col("features"), 1) * 255, 0).cast("int")
            .as("gray_decoded"))
    }),

    // ── Text analysis (beyond-parity) ───────────────────────────────────
    "q35_lang_id" -> ((s, dir) =>
      tbl(s, dir, "documents").select(
        col("doc_id"), col("lang").as("actual_lang"),
        Text.langIdByStopwords(Text.tokens(col("text")), langMarkers).as("pred_lang"))),
    "q36_quality" -> ((s, dir) => {
      val toks = Text.tokens(col("text"))
      tbl(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        Text.qualityScore(col("text"), toks).as("quality_score"))
    }),
    "q37_token_count" -> ((s, dir) =>
      tbl(s, dir, "documents").select(
        col("doc_id"),
        size(Text.tokens(col("text"))).as("ws_tokens"),
        Text.bpeishTokenCount(col("text")).as("bpeish_tokens"))),
    "q83_repetition" -> ((s, dir) => {
      // Gopher-style repetition quality signals: top-gram and
      // duplicated-gram fractions at word and bigram granularity, as a
      // PURE PROJECTION (one-pass sort + run-length kernel per row) —
      // zero shuffles at any corpus size, where the naive explode →
      // groupBy(doc, gram) → groupBy(doc) plan pays two shuffles on a
      // gram-inflated row count. The HOF fold form
      // (Text.repetitionStats, parity-spec'd) ran 7.4 s at sf0.1; the
      // codegen'd kernel is ~30x cheaper.
      // inline(array(...)) is a Generate barrier: each kernel runs
      // ONCE, not re-inlined per downstream fraction by project collapse.
      val stats = struct(
        graft.plans.TextKernels.repetitionStatsNative(col("text"), 1).as("w"),
        graft.plans.TextKernels.repetitionStatsNative(col("text"), 2).as("b"))
      tbl(s, dir, "documents")
        .select(col("doc_id"), inline(array(stats)))
        .filter(col("b.total") > 0)
        .select(
          col("doc_id"),
          col("w.total").as("n_words"),
          (col("w.top").cast("double") / col("w.total").cast("double"))
            .as("top_word_frac"),
          (col("w.dup").cast("double") / col("w.total").cast("double"))
            .as("dup_word_frac"),
          (col("b.top").cast("double") / col("b.total").cast("double"))
            .as("top_bigram_frac"),
          (col("b.dup").cast("double") / col("b.total").cast("double"))
            .as("dup_bigram_frac"))
    }),

    "q143_repetition_gate" -> ((s, dir) => {
      // Gopher-style repetition GATE (Rae et al. 2021 §A1.2) composing
      // q83's oracle-proven fractions into keep/violation verdicts —
      // same one-pass codegen'd kernel projection, zero shuffles; the
      // thresholds compare ratios of exact integer counts, identical in
      // both engines.
      val stats = struct(
        graft.plans.TextKernels.repetitionStatsNative(col("text"), 1).as("w"),
        graft.plans.TextKernels.repetitionStatsNative(col("text"), 2).as("b"))
      val twf = col("w.top").cast("double") / col("w.total").cast("double")
      val dwf = col("w.dup").cast("double") / col("w.total").cast("double")
      val tbf = col("b.top").cast("double") / col("b.total").cast("double")
      val dbf = col("b.dup").cast("double") / col("b.total").cast("double")
      val viol = (twf > 0.3).cast("int") + (dwf > 0.4).cast("int") +
        (tbf > 0.2).cast("int") + (dbf > 0.6).cast("int")
      tbl(s, dir, "documents")
        .select(col("doc_id"), inline(array(stats)))
        .filter(col("b.total") > 0)
        .select(col("doc_id"), col("w.total").as("n_words"),
          viol.as("n_violations"),
          (twf <= 0.3 && dwf <= 0.4 && tbf <= 0.2 && dbf <= 0.6).as("keep"))
    }),

    "q144_source_overlap" -> ((s, dir) => {
      // Cross-source duplication matrix — the dataset-card report behind
      // mixing/dedup decisions: for every source pair, the Jaccard
      // overlap of their distinct word-trigram sets (how much of one
      // crawl is already inside another). Scale shape: one scan
      // collapses to a distinct (source, gramHash) frame (8-byte
      // xxhash64 shuffle keys — the q121/q129 lesson), pinned because it
      // feeds both legs; shared counts come from a gram-keyed self-join
      // whose per-gram fan-out is bounded by the SOURCE count (≤ S²/2
      // pairs per gram), never the corpus; set sizes are a source-sized
      // agg, and the full matrix (zero-overlap pairs included) is a
      // cross of two source-sized tables — driver-free, broadcast-sized.
      val sh = tbl(s, dir, "documents")
        .select(col("source"),
          explode(graft.plans.TextKernels.wordShinglesNative(col("text"), 3))
            .as("g"))
        .select(col("source"), xxhash64(col("g")).as("g"))
        .distinct()
        .localCheckpoint()
      val cnt = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val shared = sh.as("a").join(sh.as("b"),
          col("a.g") === col("b.g") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared"))
      val ns = coalesce(col("n_shared"), lit(0L))
      cnt.select(col("source").as("source_a"), col("n").as("n_a"))
        .crossJoin(cnt.select(col("source").as("source_b"), col("n").as("n_b")))
        .filter(col("source_a") < col("source_b"))
        .join(shared, Seq("source_a", "source_b"), "left")
        .select(col("source_a"), col("source_b"), ns.as("n_shared"),
          col("n_a"), col("n_b"),
          round(ns.cast("double") / (col("n_a") + col("n_b") - ns), 6)
            .as("jaccard"))
    }),

    "q145_boilerplate_prefix" -> ((s, dir) => {
      // Boilerplate-prefix mining (the signal behind C4/RefinedWeb
      // repeated-header removal): normalized 30-char document prefixes
      // shared by ≥ 2 documents are template material, reported with
      // corpus spread and earliest exemplar. Scale shape: pure
      // projection → ONE map-combinable agg keyed by the bounded-width
      // prefix (count, distinct-source count, min id all partial-agg);
      // the report is top-20 via TakeOrderedAndProject. Zero windows,
      // one corpus shuffle of ≤ 30-char keys.
      tbl(s, dir, "documents")
        .select(substring(lower(trim(col("text"))), 1, 30).as("prefix"),
          col("doc_id"), col("source"))
        .groupBy(col("prefix"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          min(col("doc_id")).as("first_doc_id"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("prefix"))
        .limit(20)
    }),

    "q146_mad_outliers" -> ((s, dir) => {
      // Robust per-source outlier gate: median/MAD instead of mean/σ —
      // a single pathological document cannot drag the threshold the
      // way it drags a mean (the reason robust statistics run quality
      // anomaly gates in practice). Flags docs whose quality deviates
      // from their source's median by > 3×MAD. Scale shape: quality is
      // the q36 codegen'd projection, pinned once; both robust stats
      // collapse to source-sized tables broadcast back onto the pinned
      // frame — the corpus is never shuffled. Exact percentile is the
      // oracle-able form; approx_percentile is the drop-in 100 TB knob
      // with the identical plan shape (the q142 pairing). Determinism:
      // median interpolation, abs, and the 3×MAD compare are single
      // IEEE ops on identical inputs — bit-equal cross-engine.
      val q = tbl(s, dir, "documents").select(col("doc_id"), col("source"),
          Text.qualityScore(col("text"), Text.tokens(col("text"))).as("quality"))
        .localCheckpoint()
      val med = q.groupBy(col("source"))
        .agg(percentile(col("quality"), lit(0.5)).as("med"))
      val dev = q.join(broadcast(med), Seq("source"))
        .withColumn("dev", abs(col("quality") - col("med")))
      val mad = dev.groupBy(col("source"))
        .agg(percentile(col("dev"), lit(0.5)).as("mad"))
      dev.join(broadcast(mad), Seq("source"))
        .select(col("doc_id"), col("source"),
          round(col("quality"), 6).as("quality"),
          round(col("med"), 6).as("med"),
          round(col("dev"), 6).as("dev"),
          (col("dev") > lit(3.0) * col("mad")).as("is_outlier"))
    }),

    "q147_knn_label_agreement" -> ((s, dir) => {
      // Embedding-space quality probe: does each vector's (approximate)
      // nearest neighbor carry the same label? The standard sanity
      // report before an embedding column drives dedup or search.
      // Scale-honest kNN: neighbors come from the LSH bucket join
      // (candidate-bounded, never all-pairs); the per-vector argmax is
      // min(struct(-cos, id)) — map-combinable, no window on the pair
      // stream; label join-backs are id-keyed; the report is
      // label-count-sized. Determinism: both engines compute identical
      // IEEE cosines (the q66 contract); equal-cos ties break to the
      // lowest neighbor id via the struct order.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val pairs = Similarity.nearDuplicatePairs(e, "vec_id", "embedding",
        nPlanes = 4, dim = dim, threshold = 0.3)
      val sym = pairs
        .select(col("id_a").as("v"), col("id_b").as("nb"), col("cosine_sim"))
        .union(pairs
          .select(col("id_b").as("v"), col("id_a").as("nb"), col("cosine_sim")))
      val nn = sym.groupBy(col("v"))
        .agg(min(struct((-col("cosine_sim")).as("nc"), col("nb").as("nb")))
          .as("m"))
        .select(col("v"), col("m.nb").as("nb"))
      val lab = e.select(col("vec_id"), col("label"))
      val nnl = nn
        .join(lab.select(col("vec_id").as("v"), col("label")), Seq("v"))
        .join(lab.select(col("vec_id").as("nb"), col("label").as("nb_label")),
          Seq("nb"))
      val agg = nnl.groupBy(col("label"))
        .agg(count(lit(1)).as("n_matched"),
          sum(when(col("label") === col("nb_label"), 1L).otherwise(0L))
            .as("n_agree"))
      lab.groupBy(col("label")).agg(count(lit(1)).as("n_vectors"))
        .join(agg, Seq("label"), "left")
        .select(col("label"), col("n_vectors"),
          coalesce(col("n_matched"), lit(0L)).as("n_matched"),
          coalesce(col("n_agree"), lit(0L)).as("n_agree"),
          when(coalesce(col("n_matched"), lit(0L)) === 0,
            lit(null).cast("double"))
            .otherwise(round(col("n_agree").cast("double") / col("n_matched"), 6))
            .as("agree_rate"))
    }),

    "q148_hard_negatives" -> ((s, dir) => {
      // Contrastive-training data prep: for each vector, the top-2 most
      // similar neighbors that carry a DIFFERENT label (hard negatives).
      // Scale shape: candidates come from the LSH bucket join (bounded,
      // never all-pairs); per-vector top-k goes through the native
      // TopKPerKey physical operator, so each map partition is k-bounded
      // per key BEFORE the exchange — no window over the pair stream.
      // Determinism: selection runs on EXACT IEEE cosines (the q66
      // contract; rounding happens after top-k), ties break to the
      // lowest neighbor id via the (cos desc, nb asc) total order.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val pairs = Similarity.nearDuplicatePairs(e, "vec_id", "embedding",
        nPlanes = 4, dim = dim, threshold = 0.3)
      val lab = e.select(col("vec_id"), col("label"))
      val sym = pairs
        .select(col("id_a").as("v"), col("id_b").as("nb"),
          col("cosine_sim").as("cos"))
        .union(pairs.select(col("id_b").as("v"), col("id_a").as("nb"),
          col("cosine_sim").as("cos")))
      val cross = sym
        .join(lab.select(col("vec_id").as("v"), col("label")), Seq("v"))
        .join(lab.select(col("vec_id").as("nb"), col("label").as("nb_label")),
          Seq("nb"))
        .filter(col("label") =!= col("nb_label"))
        .select(col("v"), col("nb"), col("label"), col("nb_label"), col("cos"))
      org.apache.spark.sql.graft.TopKPerKey(cross,
        Seq("v"), Seq(("cos", false), ("nb", true)), k = 2)
        .select(col("v"), col("nb"), col("label"), col("nb_label"),
          round(col("cos"), 6).as("cos"))
    }),

    "q149_label_centroids" -> ((s, dir) => {
      // Inter-class embedding separation report: per-label centroid,
      // then pairwise cosine between centroids — the label-count-sized
      // matrix that says whether an embedding column can drive
      // label-aware dedup or search. The centroid mean uses the
      // position-ordered fold (vec_id order) so both engines fold the
      // same floats in the same order — the oracle-able form; the
      // order-free `avg` is the drop-in 100 TB knob with identical plan
      // shape (map-combinable partials, no per-group list). Everything
      // after the (label, dim) agg is centroid-table-sized; the pairwise
      // cosine reuses the exact q66 dot/norm contract.
      val e = tbl(s, dir, "embeddings")
      val ed = e.select(col("vec_id"), col("label"),
          posexplode(Vectors.toDoubleVec(col("embedding"))).as(Seq("dim", "x")))
      val cent = ed.groupBy(col("label"), col("dim"))
        .agg((aggregate(array_sort(collect_list(struct(col("vec_id"), col("x")))),
          lit(0.0), (a, r) => a + r.getField("x")) / count(lit(1))).as("c"))
      val cv = cent.groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
          r => r.getField("c")).as("cv"))
      val a = cv.select(col("label").as("label_a"), col("cv").as("va"))
      val b = cv.select(col("label").as("label_b"), col("cv").as("vb"))
      a.crossJoin(b).filter(col("label_a") < col("label_b"))
        .select(col("label_a"), col("label_b"),
          round(Vectors.dot(col("va"), col("vb")) /
            (Vectors.l2Norm(col("va")) * Vectors.l2Norm(col("vb"))), 6)
            .as("centroid_cos"))
    }),

    "q150_padding_efficiency" -> ((s, dir) => {
      // Batch-shape planning report: for each candidate max sequence
      // length, per source — tokens kept vs truncated, pad waste under
      // naive one-doc-per-row padding, and the packed row count (the
      // q77 packing upper bound), i.e. the numbers that pick seq_len
      // before a training run. Pure integer arithmetic on one corpus
      // scan (token count is the codegen'd q37 projection); the explode
      // over 3 literal lengths triples rows BEFORE a map-combinable
      // source×len agg — output is sources × lengths.
      val d = tbl(s, dir, "documents").select(col("source"),
        size(Text.tokens(col("text"))).cast("bigint").as("n_tok"))
      d.select(col("source"), col("n_tok"),
          explode(array(lit(128), lit(512), lit(2048))).as("seq_len"))
        .groupBy(col("source"), col("seq_len"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(least(col("n_tok"), col("seq_len").cast("bigint")))
            .as("kept_tokens"),
          sum(greatest(col("n_tok") - col("seq_len"), lit(0L)))
            .as("truncated_tokens"))
        .select(col("source"), col("seq_len"), col("n_docs"), col("n_tokens"),
          col("kept_tokens"), col("truncated_tokens"),
          (col("n_docs") * col("seq_len") - col("kept_tokens")).as("pad_waste"),
          floor((col("kept_tokens") + col("seq_len") - 1) / col("seq_len"))
            .cast("bigint").as("packed_rows"),
          round(col("kept_tokens").cast("double") /
            (floor((col("kept_tokens") + col("seq_len") - 1) / col("seq_len")) *
              col("seq_len")), 6).as("pack_efficiency"))
    }),

    "q151_lexical_diversity" -> ((s, dir) => {
      // Per-source lexical-diversity signals: type-token ratio and hapax
      // fraction — the cheap vocabulary-health stats that flag template
      // spam (low TTR) and OCR noise (high hapax) before training. One
      // corpus scan collapsing to (source, term) counts (map-combinable,
      // the q127 shuffle shape), then a source-sized rollup; divisions
      // are single IEEE ops on exact integer counts — bit-equal
      // cross-engine.
      val tf = tbl(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("source"), col("term")).agg(count(lit(1)).as("cnt"))
      tf.groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
          round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
          round(col("n_hapax").cast("double") / col("n_types"), 6)
            .as("hapax_frac"))
    }),

    "q152_cluster_sizes" -> ((s, dir) => {
      // Dataset-card staple: the near-dup cluster-size histogram (how
      // much of the corpus sits in 2-clusters vs mega-clusters decides
      // whether dedup keeps or reshapes the distribution). Reuses q72's
      // component assignment (LSH pairs → min-label CC, singletons not
      // in the pair graph excluded by construction); both rollups are
      // map-combinable and the output is histogram-sized.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val pairs = Similarity.nearDuplicatePairs(e, "vec_id", "embedding",
        nPlanes = 4, dim = dim, threshold = 0.3).select("id_a", "id_b")
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("cluster_size")).as("n_vectors"))
    }),

    "q153_zipf_head" -> ((s, dir) => {
      // Zipf head report: top-50 corpus terms with rank and cumulative
      // coverage — the "how much text do the top-k types explain"
      // number behind stopword lists and vocab-size choices. Scale
      // shape: one (term) partial agg, the head extracted by
      // orderBy+limit (TakeOrderedAndProject — the q119 lesson); the
      // rank/cumsum window runs AFTER the limit, over exactly 50 rows
      // on one partition, so the global-window hazard never touches the
      // vocab-sized table. Counts are integers — cumulative fractions
      // are single exact divisions.
      val tc = tbl(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val tot = tc.agg(sum(col("cnt")).as("total"))
      // Rank + running sum over the 50-row post-limit tail go through
      // the triangular self-join (ScalableWindow.boundedRankCum), not an
      // unpartitioned window — same values, no single-partition stage.
      val top50 = tc.orderBy(col("cnt").desc, col("term")).limit(50)
      operators.ScalableWindow.boundedRankCum(top50,
          Seq(("cnt", false), ("term", true)), "rank", Seq(("cnt", "cum")))
        .crossJoin(broadcast(tot))
        .select(col("rank").cast("int").as("rank"), col("term"), col("cnt"),
          round(col("cum").cast("double") / col("total"), 6)
            .as("cum_frac"))
    }),

    "q154_quality_length_corr" -> ((s, dir) => {
      // Per-source Pearson correlation between document length and the
      // q36 quality score — the audit that catches a quality signal
      // that is secretly just a length proxy. Float sums are
      // order-dependent, so all five moments fold in doc_id order
      // (position-ordered fold, the q149 contract) for the bit-exact
      // oracle; the order-free sum/avg moments are the 100 TB knob with
      // the identical one-shuffle plan. The r formula is written with
      // the identical IEEE op sequence in both engines.
      val q = tbl(s, dir, "documents").select(col("doc_id"), col("source"),
        col("n_chars").cast("double").as("x"),
        Text.qualityScore(col("text"), Text.tokens(col("text"))).as("y"))
      def fold(e: Column): Column =
        aggregate(array_sort(collect_list(struct(col("doc_id"), e.as("e")))),
          lit(0.0), (a, r) => a + r.getField("e"))
      val m = q.groupBy(col("source")).agg(
        count(lit(1)).cast("double").as("n"),
        fold(col("x")).as("sx"), fold(col("y")).as("sy"),
        fold(col("x") * col("y")).as("sxy"),
        fold(col("x") * col("x")).as("sx2"),
        fold(col("y") * col("y")).as("sy2"))
      m.select(col("source"), col("n").cast("bigint").as("n_docs"),
        when((col("n") * col("sx2") - col("sx") * col("sx")) *
          (col("n") * col("sy2") - col("sy") * col("sy")) <= 0,
          lit(null).cast("double"))
          .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sx2") - col("sx") * col("sx")) *
             sqrt(col("n") * col("sy2") - col("sy") * col("sy"))), 6))
          .as("corr_len_quality"))
    }),

    "q157_length_debias" -> ((s, dir) => {
      // The FIX for what q154 detects: length-debiased quality — fit
      // quality = a + b·length per source (closed-form least squares
      // from the same five ordered-fold moments) and emit each doc's
      // residual, the quality signal with the length proxy regressed
      // out. Scale shape: one corpus scan feeds the moment shuffle; the
      // source-sized (a, b) table broadcasts back onto the pinned
      // frame; the residual is a codegen'd projection. Determinism:
      // identical fold order and an identical IEEE op sequence for
      // b, a, and the residual in both engines; a zero-variance source
      // yields null residuals in both.
      val q = tbl(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars").cast("double").as("x"),
          Text.qualityScore(col("text"), Text.tokens(col("text"))).as("y"))
        .localCheckpoint()
      def fold(e: Column): Column =
        aggregate(array_sort(collect_list(struct(col("doc_id"), e.as("e")))),
          lit(0.0), (a, r) => a + r.getField("e"))
      val m = q.groupBy(col("source")).agg(
        count(lit(1)).cast("double").as("n"),
        fold(col("x")).as("sx"), fold(col("y")).as("sy"),
        fold(col("x") * col("y")).as("sxy"),
        fold(col("x") * col("x")).as("sx2"))
      val ab = m.select(col("source"), col("n"), col("sx"), col("sy"),
        when(col("n") * col("sx2") - col("sx") * col("sx") === 0,
          lit(null).cast("double"))
          .otherwise((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sx2") - col("sx") * col("sx"))).as("b"))
        .select(col("source"), col("b"),
          ((col("sy") - col("b") * col("sx")) / col("n")).as("a"))
      q.join(broadcast(ab), Seq("source"))
        .select(col("doc_id"), col("source"),
          round(col("y"), 6).as("quality"),
          round(col("y") - (col("a") + col("b") * col("x")), 6)
            .as("debiased_quality"))
    }),

    "q158_bpe_pair_stats" -> ((s, dir) => {
      // The BPE merge-round statistic on the oracle path: frequency-
      // weighted adjacent-symbol-pair counts — exactly what the
      // tokenizer trainer's argmax reads each round (operators.Bpe;
      // the full learnMerges loop is spec-covered) — top 20 by count.
      // Scale shape: ONE corpus scan builds the VOCABULARY-sized word
      // table; the pair explode runs over that table's symbol arrays
      // (never the corpus); the count is a map-combinable partial agg
      // and the top-k is TakeOrderedAndProject.
      import graft.operators.Bpe
      val words = Bpe.wordTable(tbl(s, dir, "documents"), "text")
        .filter(col("word") =!= "")
      Bpe.pairCounts(words)
        .orderBy(col("pair_count").desc, col("a"), col("b")).limit(20)
    }),

    "q159_gram_matrix" -> ((s, dir) =>
      // Distributed Gram matrix XᵀX over the embedding corpus — the
      // covariance/PCA precursor. The typed GramMatrix Aggregator folds
      // each partition into ONE d(d+1)/2-double buffer (map-side
      // combine), so shuffle volume is partitions×2080 doubles; the
      // posexplode+self-join alternative would shuffle corpus×d² rows.
      // 4-dp rounding absorbs summation-order drift vs the oracle's
      // flat self-join formulation.
      operators.Pca.gramUpper(tbl(s, dir, "embeddings"), "embedding", 64)
        .select(col("i"), col("j"), round(col("gram"), 4).as("gram"))),

    "q160_scd2_dimension" -> ((s, dir) => {
      // Kimball SCD Type-2 dimension merge (operators.Scd): a derived
      // update snapshot — balance bump for custkey%7==0, brand-new
      // keys for custkey%13==0 — merges into the customer dimension:
      // changed keys close version 1 and open version 2, new keys
      // insert at version 1, everything else carries forward. The
      // changed-key set is delta-sized and broadcasts for the base's
      // close/carry routing; the base never re-shuffles after the one
      // key-keyed compare join. Balance arithmetic is the identical
      // IEEE `+100.0` on both engines — no rounding needed.
      import graft.operators.Scd
      val snap = tbl(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      val base = Scd.asDimension(snap, "2026-01-01")
      val upd = snap.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), (col("c_acctbal") + lit(100.0)).as("c_acctbal"))
        .unionByName(snap.filter(col("c_custkey") % 13 === 0)
          .select((col("c_custkey") + lit(10000000L)).as("c_custkey"),
            lit(0.0).as("c_acctbal")))
      Scd.scd2Merge(base, upd, "c_custkey", Seq("c_acctbal"), "2026-06-01")
    }),

    "q162_pit_join" -> ((s, dir) => {
      // Point-in-time-correct dimension lookup — the feature-store PIT
      // join that prevents training-data leakage: each fact joins the
      // dimension VERSION that was valid at fact time, never a later
      // one. Composes q160's SCD2 machinery (v1 from 1990, balances
      // bumped for custkey%3==0 on 1995-06-17) with an equi+interval
      // join: Spark plans the c_custkey equality as the join key and
      // the [valid_from, valid_to) interval as a post-join filter — a
      // plain key-shuffled join at 100 TB, no interval blow-up, since
      // versions-per-key is small by construction.
      import graft.operators.Scd
      val snap = tbl(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      val base = Scd.asDimension(snap, "1990-01-01")
      val upd = snap.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), (col("c_acctbal") + lit(500.0)).as("c_acctbal"))
      val dim = Scd.scd2Merge(base, upd, "c_custkey", Seq("c_acctbal"), "1995-06-17")
      val o = tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("o_date"))
      o.join(dim, o("o_custkey") === dim("c_custkey") &&
          col("o_date") >= to_date(dim("valid_from")) &&
          col("o_date") < to_date(dim("valid_to")))
        .select(col("o_orderkey"),
          date_format(col("o_date"), "yyyy-MM-dd").as("o_date"),
          col("c_acctbal").as("acctbal_asof"), col("version"))
    }),

    "q161_pca_power" -> ((s, dir) =>
      // Top principal component, split the way MLlib splits it: the
      // O(n·d²) Gram pass is DISTRIBUTED (q159's aggregator), the
      // O(d²·iters) eigensolve runs on the DRIVER over the collected
      // d×d matrix (bounded state, same contract as SemDeDup's k×dim
      // centroids). Fixed 10 power iterations from the deterministic
      // x₀=1/√d start make the result a pure function of the data —
      // the oracle replays the identical iterations as unrolled SQL.
      operators.Pca.topComponent(tbl(s, dir, "embeddings"), "embedding", 64, iters = 10)
        .select(col("component"), round(col("loading"), 4).as("loading"),
          round(col("eigenvalue"), 3).as("eigenvalue"))),

    "q163_pagerank" -> ((s, dir) => {
      // PageRank over the supplier co-purchase graph (distinct supplier
      // pairs sharing an order). Per iteration: ONE edge-scan hash join
      // keyed on src + one map-combinable sum keyed on dst — rank state
      // is node-sized, lineage re-pinned per round, only the node count
      // reaches the driver. 10 fixed damped iterations from the uniform
      // start replay exactly as the oracle's unrolled MATERIALIZED CTEs
      // (the q161 lesson: without MATERIALIZED, DuckDB re-expands the
      // edge build per iteration).
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val a = li.select(col("l_orderkey"), col("l_suppkey").as("src"))
      val b = li.select(col("l_orderkey"), col("l_suppkey").as("dst"))
      val edges = a.join(b, Seq("l_orderkey"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct()
      val nodes = tbl(s, dir, "supplier").select(col("s_suppkey"))
      graph.PageRank.run(edges, "src", "dst", nodes, "s_suppkey",
          damping = 0.85, iters = 10)
        .select(col("node").as("s_suppkey"),
          round(col("rank"), 8).as("pagerank"))
    }),

    "q164_assoc_rules" -> ((s, dir) => {
      // Market-basket association rules (support / confidence / lift)
      // over per-order brand baskets — the classic co-occurrence mining
      // shape. Baskets come from one corpus join (lineitem⋈part on the
      // FK); the pair generation is a self-join keyed on the ORDER (per-
      // key multiplicity ≤ distinct brands per order, so the output is
      // ~pairs-per-basket × orders, linear in the fact table — never
      // brand×brand×corpus). Brand marginals are brand-dimension-sized
      // and broadcast back; totals ride a 1-row crossJoin. All ratios
      // are single double divisions of exact BIGINTs (engine convention).
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val items = li.join(p, li("l_partkey") === p("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .distinct()
      val totals = items.agg(countDistinct(col("ok")).as("n_baskets"))
      val marg = items.groupBy(col("brand")).agg(count(lit(1)).as("cnt"))
      val pairs = items.as("a")
        .join(items.as("b"),
          col("a.ok") === col("b.ok") && col("a.brand") < col("b.brand"))
        .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
        .agg(count(lit(1)).as("pair_cnt"))
        .filter(col("pair_cnt") >= 5)
      pairs
        .join(broadcast(marg.select(col("brand").as("brand_a"), col("cnt").as("cnt_a"))), Seq("brand_a"))
        .join(broadcast(marg.select(col("brand").as("brand_b"), col("cnt").as("cnt_b"))), Seq("brand_b"))
        .crossJoin(broadcast(totals))
        .select(col("brand_a"), col("brand_b"), col("pair_cnt"),
          round(col("pair_cnt").cast("double") / col("n_baskets").cast("double"), 6)
            .as("support"),
          round(col("pair_cnt").cast("double") / col("cnt_a").cast("double"), 6)
            .as("confidence"),
          round((col("pair_cnt") * col("n_baskets")).cast("double") /
            (col("cnt_a") * col("cnt_b")).cast("double"), 6).as("lift"))
    }),

    "q165_hopping_window" -> ((s, dir) => {
      // Batch hopping-window aggregation (30-min windows sliding 15 min)
      // via Spark's native `window()` — each event lands in exactly two
      // epoch-aligned windows, so the expansion is a fixed ×2 projection
      // feeding one map-combinable aggregation; no self-join, no range
      // join. The oracle replays the same grid with time_bucket (both
      // engines align 15-min buckets to midnight-anchored origins).
      Tables.events(s, dir)
        .select(window(col("ts"), "30 minutes", "15 minutes").as("w"),
          col("event_type"), col("value"))
        .groupBy(col("w.start").as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
    }),

    "q166_funnel_steps" -> ((s, dir) => {
      // Batch funnel: users who viewed, then clicked AFTER their first
      // view, then purchased AFTER that click — strict event-time
      // ordering, the batch face of the streaming funnel. Three chained
      // user-keyed conditional-min aggregations: every shuffle is keyed
      // on user_id (corpus-bound, honest at 100 TB — no broadcast of a
      // user-sized side), each stage's state is one timestamp per
      // surviving user, and the final report is a single 1-row rollup.
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("us") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("us") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
      val nv = v.agg(count(lit(1)).as("n_view"))
      val nc = c.agg(count(lit(1)).as("n_click_after_view"))
      val np = pu.agg(count(lit(1)).as("n_purchase_after_click"))
      nv.crossJoin(nc).crossJoin(np)
        .select(col("n_view"), col("n_click_after_view"),
          col("n_purchase_after_click"),
          round(col("n_click_after_view").cast("double") /
            col("n_view").cast("double"), 6).as("click_rate"),
          round(col("n_purchase_after_click").cast("double") /
            col("n_view").cast("double"), 6).as("purchase_rate"))
    }),

    "q167_bigram_lm" -> ((s, dir) => {
      // Interpolated bigram-LM scoring (Jelinek-Mercer λ=0.7 over the
      // corpus bigram + unigram MLEs) — the next model up from q125's
      // unigram perplexity filter. Scale shape mirrors q125: the
      // positioned bigram stream comes from ONE codegen'd shingle pass
      // (no token-stream self-join, no window), the LM tables are
      // bigram-/vocab-sized partial aggs joined back by type, and
      // per-doc order is restored with the ordered (pos, lp) fold.
      // Determinism: -ln on a 6-dp grid, position-ordered summation.
      val docs = tbl(s, dir, "documents")
      val pos = docs.select(col("doc_id"),
          posexplode(graft.plans.TextKernels.wordShinglesNative(col("text"), 2)))
        .select(col("doc_id"), col("pos"),
          split(col("col"), " ").getItem(0).as("prev"),
          split(col("col"), " ").getItem(1).as("cur"))
        .localCheckpoint()
      val uni = docs.select(explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cu"))
        .localCheckpoint()
      val totU = uni.agg(sum(col("cu")).as("t"))
      val big = pos.groupBy(col("prev"), col("cur"))
        .agg(count(lit(1)).as("cb")).localCheckpoint()
      val cs = big.groupBy(col("prev")).agg(sum(col("cb")).as("cstart"))
      val lp = big.join(cs, Seq("prev"))
        .join(uni.select(col("term").as("cur"), col("cu")), Seq("cur"))
        .crossJoin(broadcast(totU))
        .select(col("prev"), col("cur"),
          round(-log(lit(0.7) *
              (col("cb").cast("double") / col("cstart").cast("double")) +
            lit(0.3) *
              (col("cu").cast("double") / col("t").cast("double"))), 6)
            .as("lp"))
      pos.join(lp, Seq("prev", "cur"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          aggregate(array_sort(collect_list(struct(col("pos"), col("lp")))),
            lit(0.0), (a, x) => a + x.getField("lp")).as("nll"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("nll") / col("n_bigrams"), 4).as("avg_neg_logp"))
    }),

    "q168_k_anonymity" -> ((s, dir) => {
      // k-anonymity suppression gate (k=5) over the (segment, nation)
      // quasi-identifier: groups below k collapse into ONE fully-
      // generalized '*' bucket — the governance pre-release check that a
      // curated dataset can't single out small cohorts. One broadcast
      // dim join + one map-combinable group count; both branches reuse
      // the same pinned QI-sized aggregate.
      val c = tbl(s, dir, "customer").select(col("c_mktsegment"), col("c_nationkey"))
      val n = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val g = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val safe = g.filter(col("n") >= 5)
        .select(col("segment"), col("nation"), col("n"),
          lit(false).as("suppressed"))
      val supp = g.filter(col("n") < 5)
        .agg(coalesce(sum(col("n")), lit(0L)).cast("long").as("n"))
        .select(lit("*").as("segment"), lit("*").as("nation"), col("n"),
          lit(true).as("suppressed"))
        .filter(col("n") > 0)
      safe.unionByName(supp)
    }),

    "q169_label_propagation" -> ((s, dir) => {
      // Community detection inside the supplier co-purchase graph via
      // deterministic synchronous label propagation (5 sweeps, min-label
      // tie-break) — splits q163's graph into densely-linked groups the
      // way near-dup families split a giant connected component. Pure
      // integer math → the oracle replays every sweep exactly.
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val a = li.select(col("l_orderkey"), col("l_suppkey").as("src"))
      val b = li.select(col("l_orderkey"), col("l_suppkey").as("dst"))
      val edges = a.join(b, Seq("l_orderkey"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct()
      val nodes = tbl(s, dir, "supplier").select(col("s_suppkey"))
      graph.LabelPropagation.run(edges, "src", "dst", nodes, "s_suppkey",
          rounds = 5)
        .select(col("node").as("s_suppkey"), col("community"))
    }),

    "q170_feature_hashing" -> ((s, dir) => {
      // Hashing-trick collision report: vocabulary → 4096 buckets via
      // the 3-hex-char md5 prefix (the engine's cross-engine hash), with
      // bucket-occupancy and collision-fraction stats — what you check
      // before fixing a feature-hash width for training. Vocab-sized
      // distinct + two map-combinable aggs; the corpus is scanned once.
      val terms = tbl(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("term"))
        .distinct()
      val loads = terms
        .select(substring(md5(col("term")), 1, 3).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("ld"))
      loads.agg(
          sum(col("ld")).cast("long").as("n_terms"),
          count(lit(1)).as("n_buckets_used"),
          max(col("ld")).as("max_load"))
        .select(col("n_terms"), col("n_buckets_used"), col("max_load"),
          round(lit(1.0) - col("n_buckets_used").cast("double") /
            col("n_terms").cast("double"), 6).as("collision_frac"))
    }),

    "q171_triangle_count" -> ((s, dir) => {
      // Triangles + clustering coefficient over the ≥5-shared-orders
      // co-purchase graph (the raw graph is complete at small SF; the
      // weight threshold is what a curation pipeline applies before any
      // cohesion metric). The degree-ordered orientation inside
      // [[graph.Triangles]] bounds the wedge join at O(m^1.5) — the
      // reason this runs on a hub-skewed 100 TB graph at all.
      val li = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val a = li.select(col("l_orderkey"), col("l_suppkey").as("sa"))
      val b = li.select(col("l_orderkey"), col("l_suppkey").as("sb"))
      val edges = a.join(b, Seq("l_orderkey"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= 5)
        .select(col("sa"), col("sb"))
      val nodes = tbl(s, dir, "supplier").select(col("s_suppkey"))
      graph.Triangles.perNode(edges, "sa", "sb", nodes, "s_suppkey")
        .select(col("node").as("s_suppkey"), col("degree"),
          col("n_triangles"), col("clustering_coef"))
    }),

    "q172_markov_transitions" -> ((s, dir) => {
      // First-order Markov transition matrix over per-user event
      // sequences (session path mining): P(next | current) with counts.
      // The lead() window partitions by user — per-key sequences are
      // bounded, never a global sort — and everything after it is
      // event-type²-sized. Probabilities are one double division of
      // exact counts.
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val pairs = ev.withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("cur"), col("nxt"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val marg = pairs.groupBy(col("cur")).agg(sum(col("cnt")).as("tot"))
      pairs.join(broadcast(marg), Seq("cur"))
        .select(col("cur"), col("nxt"), col("cnt"),
          round(col("cnt").cast("double") / col("tot").cast("double"), 6)
            .as("prob"))
    }),

    "q173_containment_join" -> ((s, dir) => {
      // Asymmetric containment join (|A∩B|/|A| ≥ 0.8 over distinct word-
      // trigram shingles — quote/subsumption detection, the measure
      // Jaccard misses when a small doc is swallowed by a big one).
      // Two composed scale techniques, both exact:
      //  1. EXACT-DUP COLLAPSE FIRST: containment depends only on the
      //     text, so the join runs on md5-text equivalence classes and
      //     expands back to doc ids at the end. On a replicated corpus
      //     this is the difference between O(docs²) and O(classes²)
      //     candidate work (sf1: 50k docs → 4,992 classes; identical-
      //     text pairs are emitted directly with containment 1.0).
      //  2. PPJoin-style prefix filter in containment form on the class
      //     level: index only each class's sz − ⌈t·sz⌉ + 1 RAREST
      //     shingles (global-df order) — any qualifying pair must share
      //     one — then verify candidates exactly against full sets.
      // The oracle is the brute-force all-pairs list_intersect, so it
      // independently proves the composition loses nothing. Shingles
      // (not unigrams) make the filter bite: the shared unigram
      // vocabulary would qualify ~all pairs.
      val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      val canon = docs.select(col("doc_id"), md5(col("text")).as("h"))
        .localCheckpoint()
      val reps = canon.groupBy(col("h")).agg(min(col("doc_id")).as("rep_id"))
      val repDocs = docs.join(reps, docs("doc_id") === reps("rep_id"))
        .select(col("h"), col("text"))
      val toks = repDocs.select(col("h"),
          explode(array_distinct(
            graft.plans.TextKernels.wordShinglesNative(col("text"), 3)))
            .as("term"))
        .localCheckpoint()
      val sz = toks.groupBy(col("h")).agg(count(lit(1)).as("sz"))
      val dfreq = toks.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val ordered = toks.join(dfreq, Seq("term"))
        .groupBy(col("h"))
        .agg(array_sort(collect_list(struct(col("df"), col("term")))).as("ts"))
      val prefix = ordered.select(col("h").as("ha"),
          explode(expr(
            "slice(ts, 1, size(ts) - cast(ceil(0.8 * size(ts)) as int) + 1)"))
            .as("p"))
        .select(col("ha"), col("p.term").as("term"))
      val cand = prefix
        .join(toks.select(col("h").as("hb"), col("term")), Seq("term"))
        .filter(col("ha") =!= col("hb"))
        .select(col("ha"), col("hb")).distinct()
      val ta = toks.select(col("h").as("ha"), col("term"))
      val tb = toks.select(col("h").as("hb"), col("term"))
      val inter = cand.join(ta, Seq("ha")).join(tb, Seq("hb", "term"))
        .groupBy(col("ha"), col("hb")).agg(count(lit(1)).as("inter"))
      val classPairs = inter
        .join(sz.select(col("h").as("ha"), col("sz").as("sz_a")), Seq("ha"))
        .filter(col("inter").cast("double") / col("sz_a").cast("double") >= 0.8)
      val cross = classPairs
        .join(canon.select(col("h").as("ha"), col("doc_id").as("id_a")), Seq("ha"))
        .join(canon.select(col("h").as("hb"), col("doc_id").as("id_b")), Seq("hb"))
        .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"),
          round(col("inter").cast("double") / col("sz_a").cast("double"), 6)
            .as("containment"))
      val within = canon.select(col("h"), col("doc_id").as("id_a"))
        .join(canon.select(col("h"), col("doc_id").as("id_b")), Seq("h"))
        .filter(col("id_a") =!= col("id_b"))
        .join(sz, Seq("h"))
        .select(col("id_a"), col("id_b"), col("sz").as("inter"),
          col("sz").as("sz_a"), lit(1.0).as("containment"))
      cross.unionByName(within)
    }),

    "q174_rrf_fusion" -> ((s, dir) => {
      // Hybrid retrieval: q123's BM25 lexical scorer + q38's exact-cosine
      // contract, fused with reciprocal-rank fusion
      // rrf(d) = Σ_modality 1/(60 + rank) (Cormack et al. 2009) — the
      // standard way modern search blends keyword and embedding signals.
      // Each modality is cut to top-50 by TakeOrderedAndProject, then
      // ranked by the triangular self-join (the q153 rule — no window
      // ever, not even over 50 rows); the fusion is a 50∪50-row
      // full-outer join.
      val qTerms = Seq("spark", "merge", "window")
      val docs = tbl(s, dir, "documents")
      val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      val dl = toks.select(col("doc_id"), size(col("toks")).as("dl"))
        .localCheckpoint()
      val stats = dl.agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))
      val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
        .filter(col("term").isin(qTerms: _*))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val comp = round(
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))), 6)
      val bm25 = tf.join(broadcast(df_), Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          struct(col("term").as("term"), comp.as("comp")).as("tc"))
        .groupBy(col("doc_id"))
        .agg(aggregate(array_sort(collect_list(col("tc"))), lit(0.0),
          (acc, x) => acc + x.getField("comp")).as("sc"))
        .select(col("doc_id"), round(col("sc"), 4).as("bm25"))
      val lexRank = operators.ScalableWindow.boundedRankCum(
          bm25.orderBy(col("bm25").desc, col("doc_id")).limit(50),
          Seq(("bm25", false), ("doc_id", true)), "r_lex")
        .select(col("doc_id"), col("r_lex"))
      val e = tbl(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
      val semRank = operators.ScalableWindow.boundedRankCum(
          e.select(col("vec_id").as("doc_id"),
            Vectors.cosineToConst(col("embedding"), qv).as("cos"))
          .orderBy(col("cos").desc, col("doc_id")).limit(50),
          Seq(("cos", false), ("doc_id", true)), "r_sem")
        .select(col("doc_id"), col("r_sem"))
      lexRank.join(semRank, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          round(coalesce(lit(1.0) / (lit(60L) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60L) + col("r_sem")), lit(0.0)), 8)
            .as("rrf"),
          col("r_lex"), col("r_sem"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(20)
    }),

    "q175_weighted_sample" -> ((s, dir) => {
      // Efraimidis–Spirtes weighted sampling WITHOUT replacement via
      // deterministic exponential clocks: clock(d) = −ln(u_d)/w_d with
      // u_d a unit-interval double derived from md5(doc_id) (the q88
      // affinity idiom — no RNG, replayable on any engine) and weight
      // w = n_chars; the k smallest clocks ARE a weighted sample. One
      // codegen'd projection + TakeOrderedAndProject — zero shuffles of
      // corpus data beyond the top-k exchange at any scale.
      val u = (expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as double)")
        + lit(0.5)) / lit(4294967296.0)
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(-log(u) / col("n_chars").cast("double"), 6).as("clock"))
        .orderBy(col("clock"), col("doc_id")).limit(20)
    }),

    "q176_stratified_sample" -> ((s, dir) => {
      // Deterministic stratified sample: 5 docs per source in md5 order
      // — a per-stratum reservoir that never changes as the corpus grows
      // (the q130 content-stable-split property, per key). Runs through
      // the native TopKPerKey physical operator, so each map partition
      // holds at most k rows per stratum before the exchange — no
      // per-source sort, no window over the corpus.
      val docs = tbl(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("hk"))
      org.apache.spark.sql.graft.TopKPerKey(docs, Seq("source"),
          Seq(("hk", true), ("doc_id", true)), k = 5)
        .select(col("source"), col("doc_id"), col("hk"))
    }),

    "q177_moment_profile" -> ((s, dir) => {
      // Distribution profile (mean/stddev/skewness/kurtosis) per source
      // from EXACT integer power sums: n_chars ≤ ~600 keeps Σx⁴ inside
      // BIGINT, so the four sums are map-combinable exact aggregates and
      // every float appears only in the final per-source derivation —
      // bit-identical across engines with no ordered-fold machinery.
      val x = col("n_chars")
      val g = tbl(s, dir, "documents")
        .select(col("source"), x.as("x"), (x * x).as("x2"),
          (x * x * x).as("x3"), (x * x * x * x).as("x4"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(col("x2")).as("s2"), sum(col("x3")).as("s3"),
          sum(col("x4")).as("s4"))
      val nd = col("n").cast("double")
      val m = col("s1").cast("double") / nd
      val e2 = col("s2").cast("double") / nd
      val e3 = col("s3").cast("double") / nd
      val e4 = col("s4").cast("double") / nd
      val v = e2 - m * m
      val sd = sqrt(v)
      val skew = (e3 - m * lit(3.0) * v - m * m * m) / (v * sd)
      val kurt = (e4 - lit(4.0) * m * e3 + lit(6.0) * m * m * e2 -
        lit(3.0) * m * m * m * m) / (v * v)
      g.select(col("source"), col("n"), round(m, 4).as("mean"),
        round(sd, 4).as("stddev"), round(skew, 4).as("skewness"),
        round(kurt, 4).as("kurtosis"))
    }),

    "q178_ks_drift" -> ((s, dir) => {
      // Two-sample Kolmogorov–Smirnov drift per source: sup |F_s − F|
      // between each source's n_chars CDF and the corpus CDF, evaluated
      // on the full distinct-value grid (both CDFs are step functions,
      // so the sup is attained there). The corpus collapses to a
      // (source, value)-sized count table FIRST; every window after that
      // is bounded by distinct values (~hundreds), never corpus rows —
      // the same bounded-state argument as the q146 robust gate.
      val perSV = tbl(s, dir, "documents")
        .select(col("source"), col("n_chars").as("x"))
        .groupBy(col("source"), col("x")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val srcTot = perSV.groupBy(col("source")).agg(sum(col("c")).as("ns"))
      val corpus = perSV.groupBy(col("x")).agg(sum(col("c")).as("cc"))
        .localCheckpoint()
      val corpTotal = corpus.agg(sum(col("cc")).as("nc"))
      // Corpus-CDF cumsum over the distinct-value grid: banded two-pass
      // (ScalableWindow), not an unpartitioned window — the grid is
      // value-domain-bounded but still grows with the domain at 100 TB.
      val corpCum = operators.ScalableWindow.bandedCumSum(corpus,
        bandOn = "x", descending = false, tieBreakers = Nil,
        sumCol = "cc", out = "ccum")
      val grid = srcTot.crossJoin(corpus.select(col("x")))
        .join(perSV, Seq("source", "x"), "left")
        .select(col("source"), col("ns"), col("x"),
          coalesce(col("c"), lit(0L)).as("c"))
      val srcCum = grid.withColumn("scum",
        sum(col("c")).over(Window.partitionBy(col("source")).orderBy(col("x"))))
      srcCum.join(corpCum.select(col("x"), col("ccum")), Seq("x"))
        .crossJoin(broadcast(corpTotal))
        .select(col("source"), col("ns"),
          abs(col("scum").cast("double") / col("ns").cast("double") -
            col("ccum").cast("double") / col("nc").cast("double")).as("d"))
        .groupBy(col("source"), col("ns"))
        .agg(round(max(col("d")), 6).as("ks"))
        .select(col("source"), col("ns").as("n"), col("ks"))
    }),

    "q179_link_prediction" -> ((s, dir) => {
      // Link prediction on the ≥20-shared-orders co-purchase graph:
      // common-neighbor count + Adamic–Adar (Σ 1/ln(deg z) over shared
      // neighbors) for NON-adjacent pairs — the classic "which edge
      // appears next" score. Wedge enumeration is the only corpus-shaped
      // join; scoring components live on a node-sized table (6-dp grid)
      // and sum per pair in neighbor order (the engine's ordered fold).
      // Top-20 is TakeOrderedAndProject. (At sf0.001 the 10-node graph
      // is complete — no non-adjacent pairs, an empty frontier, which
      // both engines agree on.)
      val li = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val a = li.select(col("l_orderkey"), col("l_suppkey").as("sa"))
      val b = li.select(col("l_orderkey"), col("l_suppkey").as("sb"))
      val e = a.join(b, Seq("l_orderkey"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= 20)
        .select(col("sa"), col("sb"))
        .localCheckpoint()
      val und = e.union(e.select(col("sb").as("sa"), col("sa").as("sb")))
      val deg = und.groupBy(col("sa").as("node")).agg(count(lit(1)).as("deg"))
      val compz = deg.filter(col("deg") >= 2)
        .select(col("node").as("z"),
          round(lit(1.0) / log(col("deg").cast("double")), 6).as("comp"))
      val e1 = und.select(col("sa").as("u"), col("sb").as("z"))
      val e2 = und.select(col("sa").as("z"), col("sb").as("v"))
      val wedges = e1.join(e2, Seq("z")).filter(col("u") < col("v"))
      val cand = wedges.join(e,
        wedges("u") === e("sa") && wedges("v") === e("sb"), "left_anti")
      cand.join(compz, Seq("z"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"),
          round(aggregate(array_sort(collect_list(struct(col("z"), col("comp")))),
            lit(0.0), (acc, x) => acc + x.getField("comp")), 4)
            .as("adamic_adar"))
        .select(col("u").as("s_a"), col("v").as("s_b"), col("cn"),
          col("adamic_adar"))
        .orderBy(col("adamic_adar").desc, col("s_a"), col("s_b")).limit(20)
    }),

    "q180_frequent_triples" -> ((s, dir) => {
      // Level-wise Apriori: frequent brand PAIRS (L2) generate candidate
      // triples, pruned by the anti-monotone property (every 2-subset
      // must itself be frequent) BEFORE any counting touches the corpus
      // — the candidate set is dimension-sized and broadcast into the
      // per-basket triple stream (≤ C(brands-per-basket,3) rows per
      // order, linear in the fact table). Support is RELATIVE (0.5% of
      // baskets) as an exact integer comparison, cnt·200 ≥ n_baskets —
      // no float thresholds, stable across corpus sizes.
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val items = li.join(p, li("l_partkey") === p("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .distinct()
        .localCheckpoint()
      val totals = items.agg(countDistinct(col("ok")).as("n_baskets"))
      val l2 = items.as("x").join(items.as("y"),
          col("x.ok") === col("y.ok") && col("x.brand") < col("y.brand"))
        .groupBy(col("x.brand").as("pa"), col("y.brand").as("pb"))
        .agg(count(lit(1)).as("pc"))
        .crossJoin(broadcast(totals))
        .filter(col("pc") * 200 >= col("n_baskets"))
        .select(col("pa"), col("pb"))
        .localCheckpoint()
      // Candidate join L2⋈L2 on the first item, then the Apriori prune:
      // (b, c) must also be in L2.
      val cand = l2.as("m").join(l2.as("n"),
          col("m.pa") === col("n.pa") && col("m.pb") < col("n.pb"))
        .select(col("m.pa").as("a"), col("m.pb").as("b"), col("n.pb").as("c"))
        .join(l2.select(col("pa").as("b"), col("pb").as("c")), Seq("b", "c"),
          "left_semi")
      // Apriori prune BEFORE the third self-join: the (i1,i2) pair
      // stream semi-joins broadcast L2 first, so a hot basket (retail
      // scale: thousands of items) contributes frequent-pair rows — not
      // C(width,2) rows — to the triple enumeration, bounding the
      // intermediate at |frequent pairs|·width instead of width³.
      // PlanSpec asserts this semi-join sits BELOW the final candidate
      // semi-join in the plan.
      val triples = items.as("i1")
        .join(items.as("i2"),
          col("i1.ok") === col("i2.ok") && col("i1.brand") < col("i2.brand"))
        .select(col("i1.ok").as("pair_ok"), col("i1.brand").as("a"),
          col("i2.brand").as("b"))
        .join(broadcast(l2.select(col("pa").as("a"), col("pb").as("b"))),
          Seq("a", "b"), "left_semi")
        .join(items.as("i3"),
          col("pair_ok") === col("i3.ok") && col("b") < col("i3.brand"))
        .select(col("a"), col("b"), col("i3.brand").as("c"))
        .join(broadcast(cand), Seq("a", "b", "c"), "left_semi")
      triples.groupBy(col("a"), col("b"), col("c"))
        .agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(totals))
        .filter(col("cnt") * 200 >= col("n_baskets"))
        .select(col("a"), col("b"), col("c"), col("cnt"),
          round(col("cnt").cast("double") / col("n_baskets").cast("double"), 6)
            .as("support"))
    }),

    "q181_skyline" -> ((s, dir) => {
      // Pareto frontier over (n_tokens ↑, type-token ratio ↑) — the
      // multi-objective "keep the long AND lexically-rich docs" selection
      // a curation pass makes. Two-phase exact skyline: per-partition
      // local frontiers (mapPartitions — dominance is not a key-equality
      // join, the one shape the RDD tier is reserved for), then one
      // dominance anti-join over the frontier-sized candidate union.
      // TTR is rounded to its 6-dp grid BEFORE dominance in both engines.
      import s.implicits._
      val pts = tbl(s, dir, "documents")
        .select(col("doc_id").as("id"),
          size(Text.tokens(col("text"))).cast("long").as("x"),
          round(size(array_distinct(Text.tokens(col("text")))).cast("double") /
            size(Text.tokens(col("text"))).cast("double"), 6).as("y"))
        .as[operators.Skyline.Pt]
      operators.Skyline.frontier(pts)
        .select(col("id").as("doc_id"), col("x").as("n_tokens"),
          col("y").as("ttr"))
    }),

    "q182_quantile_normalize" -> ((s, dir) => {
      // Quantile normalization: every doc's n_chars is replaced by the
      // CORPUS value at the equivalent rank — the cross-source score
      // calibration a curation pipeline applies before mixing sources
      // whose scorers drift. All integer: source rank r (per-source
      // window — per-key sorts are the operation itself; approx
      // quantiles are the documented 100 TB knob, the q146 pairing),
      // target corpus rank t = ⌈r·N/n_s⌉ via exact integer div, and the
      // inverse-CDF lookup is a banded join against the value grid —
      // distinct-value-sized, broadcast, never corpus².
      val d = tbl(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars").as("x"))
      val ns_ = d.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val ntot = d.agg(count(lit(1)).as("n"))
      val r = d.withColumn("r", row_number()
        .over(Window.partitionBy(col("source")).orderBy(col("x"), col("doc_id")))
        .cast("long"))
      val tt = r.join(broadcast(ns_), Seq("source"))
        .crossJoin(broadcast(ntot))
        .withColumn("t", expr("div(r * n + n_s - 1, n_s)"))
      val grid = d.groupBy(col("x").as("gx")).agg(count(lit(1)).as("c"))
        .withColumn("ccum", sum(col("c")).over(Window.orderBy(col("gx"))))
        .withColumn("pcum", col("ccum") - col("c"))
      tt.join(broadcast(grid),
          col("t") > col("pcum") && col("t") <= col("ccum"))
        .select(col("doc_id"), col("source"), col("x"), col("gx").as("norm_x"))
    }),

    "q183_retrieval_eval" -> ((s, dir) => {
      // Ranking-quality evaluation: NDCG@10 and MRR for the exact-cosine
      // retriever, 8 label-relevance queries (vec_ids 0–7; rel = same
      // label). ONE corpus scan computes all 8 cosines as codegen'd
      // columns (stack → long format), the native TopKPerKey bounds each
      // query's candidates to 10 BEFORE any window, and the metric tail
      // is 80 rows. DCG components round to 6 dp and fold in rank order;
      // IDCG replays the same grid over sequence(1, m) in index order.
      import s.implicits._
      val e = tbl(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding"), col("label"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq,
          r.getInt(2))).sortBy(_._1)
      val cosCols = qs.flatMap { case (qid, qv, _) =>
        Seq(lit(qid), Vectors.cosineToConst(col("embedding"), qv)) }
      val withCos = e.select(Seq(col("vec_id"), col("label")) ++
        cosCols.zipWithIndex.map { case (c, i) => c.as(s"c$i") }: _*)
      val long = withCos.select(col("vec_id"), col("label"),
        expr(s"stack(${qs.size}, ${(0 until qs.size).map(i => s"c${2 * i}, c${2 * i + 1}").mkString(", ")}) AS (qid, cos)"))
      val top = org.apache.spark.sql.graft.TopKPerKey(long,
        Seq("qid"), Seq(("cos", false), ("vec_id", true)), k = 10)
      val qinfo = qs.map { case (qid, _, ql) => (qid, ql) }
        .toSeq.toDF("qid", "qlabel")
      val relCorpus = e.groupBy(col("label").as("qlabel"))
        .agg(count(lit(1)).as("n_label"))
      val ranked = top.join(broadcast(qinfo), Seq("qid"))
        .withColumn("rank", row_number()
          .over(Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id")))
          .cast("long"))
        .withColumn("rel", (col("label") === col("qlabel")).cast("int"))
        .withColumn("comp",
          round(col("rel").cast("double") /
            log2(col("rank").cast("double") + lit(1.0)), 6))
      val agg_ = ranked.groupBy(col("qid"), col("qlabel"))
        .agg(sum(col("rel")).cast("long").as("n_rel_top10"),
          aggregate(array_sort(collect_list(struct(col("rank"), col("comp")))),
            lit(0.0), (acc, x) => acc + x.getField("comp")).as("dcg"),
          min(when(col("rel") === 1, col("rank"))).as("first_rel"))
      agg_.join(broadcast(relCorpus), Seq("qlabel"))
        .withColumn("m", least(lit(10L), col("n_label")))
        .withColumn("idcg", aggregate(sequence(lit(1L), col("m")),
          lit(0.0), (acc, i) =>
            acc + round(lit(1.0) / log2(i.cast("double") + lit(1.0)), 6)))
        .select(col("qid"), col("n_rel_top10"),
          round(col("dcg") / col("idcg"), 6).as("ndcg10"),
          coalesce(round(lit(1.0) / col("first_rel").cast("double"), 6), lit(0.0))
            .as("mrr"))
    }),

    "q184_sssp" -> ((s, dir) => {
      // Bounded-hop weighted shortest paths from the three lowest
      // supplier keys over the ≥5-shared-orders co-purchase graph,
      // edge cost 1/shared-orders (strong ties are cheap). Six
      // Bellman–Ford rounds — "cheapest path using ≤6 edges" — each one
      // edge-scan join + one min-combine; the oracle unrolls the same
      // six relaxations as MATERIALIZED CTEs.
      val li = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val a = li.select(col("l_orderkey"), col("l_suppkey").as("sa"))
      val b = li.select(col("l_orderkey"), col("l_suppkey").as("sb"))
      val e = a.join(b, Seq("l_orderkey"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 5)
        .select(col("sa"), col("sb"),
          round(lit(1.0) / col("c").cast("double"), 6).as("w"))
      val und = e.unionByName(
        e.select(col("sb").as("sa"), col("sa").as("sb"), col("w")))
      val sources = tbl(s, dir, "supplier")
        .filter(col("s_suppkey") <= 3).select(col("s_suppkey"))
      graph.ShortestPaths.boundedHops(und, "sa", "sb", "w",
          sources, "s_suppkey", rounds = 6)
        .select(col("node").as("s_suppkey"), round(col("dist"), 6).as("dist"))
    }),

    "q185_noisy_counts" -> ((s, dir) => {
      // DP-STYLE noisy release: (segment, nation) counts plus Laplace
      // (b=2) noise drawn by inverse-CDF from a DETERMINISTIC md5-seeded
      // unit uniform — replayable pipeline-testing noise (documented as
      // such: real DP needs a fresh RNG; the calibration, sensitivity-1
      // counts ÷ b, is the real thing). Pairs with q168's k-anonymity
      // gate as the privacy tier. One broadcast dim join + one QI-sized
      // group count; noise is a codegen'd projection.
      val c = tbl(s, dir, "customer").select(col("c_mktsegment"), col("c_nationkey"))
      val n = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val g = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("n"))
      val u = (expr(
        "cast(conv(substring(md5(concat(segment, '|', nation)), 1, 8), 16, 10) as double)")
        + lit(0.5)) / lit(4294967296.0)
      val noise = -lit(2.0) * signum(u - lit(0.5)) *
        log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
      g.select(col("segment"), col("nation"), col("n"),
        round(noise, 4).as("noise"),
        round(col("n").cast("double") + noise, 4).as("noisy_n"))
    }),

    "q186_cdc_compact" -> ((s, dir) => {
      // CDC log compaction with last-writer-wins: a change log (derived
      // deterministically from orders — insert/update/delete by key
      // modulus, sequence = order key) collapses to one surviving row
      // per key, deletes dropping the key entirely. The compaction is
      // one map-combinable max-seq agg + one key-equi join back — the
      // merge a CDC sink runs before loading a snapshot, and the
      // row-level sibling of the SCD2 history merge (q160).
      val chg = tbl(s, dir, "orders")
        .select(col("o_custkey").as("ckey"), col("o_orderkey").as("seq"),
          when(col("o_orderkey") % 10 === 9, lit("D"))
            .when(col("o_orderkey") % 10 >= 6, lit("U"))
            .otherwise(lit("I")).as("op"),
          col("o_totalprice").cast(dec).cast("double").as("val"))
        .localCheckpoint()
      val last = chg.groupBy(col("ckey")).agg(max(col("seq")).as("seq"))
      chg.join(last, Seq("ckey", "seq"))
        .filter(col("op") =!= "D")
        .select(col("ckey"), col("seq"), col("op"), col("val"))
    }),

    "q187_path_trigrams" -> ((s, dir) => {
      // Top navigation paths: per-user consecutive event-type TRIGRAMS
      // (the length-3 extension of q172's transition matrix), counted
      // corpus-wide, top-20. The double-lead window partitions per user
      // (bounded sequences); everything after is path-type-sized and the
      // top-20 is TakeOrderedAndProject.
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("path")).limit(20)
    }),

    "q188_funnel_latency" -> ((s, dir) => {
      // Conversion-latency report: first-view → first-purchase-after
      // delay per user, with exact-count average and interpolated
      // median/p90 (the q65 percentile contract). Delays stay integer
      // microseconds through every aggregate; the µs→seconds division
      // and rounding happen exactly once at the end.
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(v, Seq("user_id")).filter(col("us") > col("t1"))
        .groupBy(col("user_id"), col("t1")).agg(min(col("us")).as("t2"))
      pu.select((col("t2") - col("t1")).as("delay_us"))
        .agg(count(lit(1)).as("n_conversions"),
          sum(col("delay_us")).as("sum_us"),
          percentile(col("delay_us"), lit(0.5)).as("med_us"),
          percentile(col("delay_us"), lit(0.9)).as("p90_us"))
        .select(col("n_conversions"),
          round(col("sum_us").cast("double") /
            col("n_conversions").cast("double") / lit(1000000.0), 4).as("avg_s"),
          round(col("med_us") / lit(1000000.0), 4).as("median_s"),
          round(col("p90_us") / lit(1000000.0), 4).as("p90_s"))
    }),

    "q189_ewma_daily" -> ((s, dir) => {
      // EWMA smoothing (α=0.3) of the daily event count series. The
      // recurrence unrolls to the closed triangular form s_t =
      // Σᵢ coef(t,i)·xᵢ, so it runs as a self-join over the DAY-SIZED
      // series (the corpus collapses to per-day counts first — the only
      // corpus-shaped step is that one map-combinable count). Components
      // round to 6 dp and fold in day order; 30 days ⇒ a 30×30/2 join.
      val daily = operators.ScalableWindow.boundedRankCum(
          Tables.events(s, dir)
            .select(expr("div(unix_micros(ts), 86400000000)").as("day"))
            .groupBy(col("day")).agg(count(lit(1)).as("x")),
          Seq(("day", true)), "t")
        .localCheckpoint()
      val a = daily.select(col("t").as("ti"), col("x").as("xi"))
      val b = daily.select(col("day"), col("t").as("tt"), col("x"))
      val comp = b.join(a, col("ti") <= col("tt"))
        .withColumn("coef",
          when(col("ti") === 1, pow(lit(0.7), (col("tt") - 1).cast("double")))
            .otherwise(lit(0.3) *
              pow(lit(0.7), (col("tt") - col("ti")).cast("double"))))
        .withColumn("c", round(col("coef") * col("xi").cast("double"), 6))
      comp.groupBy(col("day"), col("x"))
        .agg(round(aggregate(array_sort(collect_list(struct(col("ti"), col("c")))),
          lit(0.0), (acc, e) => acc + e.getField("c")), 4).as("ewma"))
    }),

    "q190_seasonality" -> ((s, dir) => {
      // Hour-of-day × day-of-week traffic profile with uniform-lift —
      // seasonality slots computed with PURE INTEGER epoch arithmetic
      // (no engine calendar functions, whose week-start conventions
      // differ): dow = (epoch_day + 4) mod 7, 0 = Sunday. One
      // map-combinable slot count; lift = one double division of exact
      // integers.
      val us = unix_micros(col("ts"))
      val slots = Tables.events(s, dir)
        .select(expr("(div(unix_micros(ts), 86400000000) + 4) % 7").as("dow"),
          expr("div(unix_micros(ts) % 86400000000, 3600000000)").as("hour"))
        .groupBy(col("dow"), col("hour")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val tot = slots.agg(sum(col("cnt")).as("total"))
      slots.crossJoin(broadcast(tot))
        .select(col("dow"), col("hour"), col("cnt"),
          round((col("cnt") * lit(168)).cast("double") /
            col("total").cast("double"), 4).as("lift"))
    }),

    "q191_cusum_changepoint" -> ((s, dir) => {
      // CUSUM changepoint estimate over the daily count series:
      // C_t = Σᵢ≤t xᵢ − t·μ (an EXACT integer cumulative minus one
      // double product), changepoint = argmax |C_t| with earliest-day
      // tie-break, plus before/after means from exact sums. Corpus
      // collapses to day counts first; every window is day-bounded.
      val daily = operators.ScalableWindow.boundedRankCum(
          Tables.events(s, dir)
            .select(expr("div(unix_micros(ts), 86400000000)").as("day"))
            .groupBy(col("day")).agg(count(lit(1)).as("x")),
          Seq(("day", true)), "t", Seq(("x", "cum")))
        .localCheckpoint()
      val stats = daily.agg(count(lit(1)).as("nd"), sum(col("x")).as("tot"))
      val cvals = daily.crossJoin(broadcast(stats))
        .withColumn("mu", col("tot").cast("double") / col("nd").cast("double"))
        .withColumn("cusum", col("cum").cast("double") - col("t").cast("double") * col("mu"))
      val cp = cvals.orderBy(abs(col("cusum")).desc, col("day")).limit(1)
        .select(col("day").as("cp_day"), col("cusum").as("cp_cusum"),
          col("nd"), col("tot"))
      daily.crossJoin(broadcast(cp))
        .groupBy(col("cp_day"), col("cp_cusum"), col("nd"))
        .agg(
          sum(when(col("day") <= col("cp_day"), col("x"))).as("sum_b"),
          count(when(col("day") <= col("cp_day"), lit(1))).as("n_b"),
          sum(when(col("day") > col("cp_day"), col("x"))).as("sum_a"),
          count(when(col("day") > col("cp_day"), lit(1))).as("n_a"))
        .select(col("cp_day"), round(col("cp_cusum"), 4).as("cusum"),
          col("nd").as("n_days"),
          round(col("sum_b").cast("double") / col("n_b").cast("double"), 4)
            .as("mean_before"),
          round(col("sum_a").cast("double") / col("n_a").cast("double"), 4)
            .as("mean_after"))
    }),

    "q192_rfm" -> ((s, dir) => {
      // RFM segmentation: per-customer recency/frequency/monetary
      // quartile codes (recency reversed — recent is better), segment
      // counts + average monetary. Quartile thresholds are EXACT
      // interpolated percentiles broadcast back (the q142/q146 rule: the
      // corpus is never window-sorted; only the customer-sized aggregate
      // is). Monetary stays DECIMAL through every sum, one double
      // division per segment at the end.
      val o = tbl(s, dir, "orders").select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"), col("o_totalprice").cast(dec).as("tp"))
      val maxd = o.agg(max(col("d")).as("dmax"))
      val cust = o.groupBy(col("o_custkey"))
        .agg(max(col("d")).as("last"), count(lit(1)).as("f"), sum(col("tp")).as("m"))
        .crossJoin(broadcast(maxd))
        .withColumn("r", datediff(col("dmax"), col("last")).cast("long"))
        .withColumn("md", col("m").cast("double"))
        .localCheckpoint()
      val th = cust.agg(
        percentile(col("r"), lit(0.25)).as("r1"),
        percentile(col("r"), lit(0.5)).as("r2"),
        percentile(col("r"), lit(0.75)).as("r3"),
        percentile(col("f"), lit(0.25)).as("f1"),
        percentile(col("f"), lit(0.5)).as("f2"),
        percentile(col("f"), lit(0.75)).as("f3"),
        percentile(col("md"), lit(0.25)).as("m1"),
        percentile(col("md"), lit(0.5)).as("m2"),
        percentile(col("md"), lit(0.75)).as("m3"))
      def codeOf(x: Column, t1: Column, t2: Column, t3: Column) =
        when(x <= t1, 1).when(x <= t2, 2).when(x <= t3, 3).otherwise(4)
      cust.crossJoin(broadcast(th))
        .select(
          (lit(5) - codeOf(col("r").cast("double"), col("r1"), col("r2"), col("r3")))
            .as("r_code"),
          codeOf(col("f").cast("double"), col("f1"), col("f2"), col("f3"))
            .as("f_code"),
          codeOf(col("md"), col("m1"), col("m2"), col("m3")).as("m_code"),
          col("m"))
        .groupBy(col("r_code"), col("f_code"), col("m_code"))
        .agg(count(lit(1)).as("n_customers"), sum(col("m")).as("sm"))
        .select(col("r_code"), col("f_code"), col("m_code"), col("n_customers"),
          round(col("sm").cast("double") / col("n_customers").cast("double"), 2)
            .as("avg_monetary"))
    }),

    "q193_minhash_accuracy" -> ((s, dir) => {
      // Sketch-accuracy evaluation: MinHash Jaccard estimates (matching
      // signature components / k) vs EXACT trigram-shingle Jaccard over
      // the adjacent-id pair set — the calibration check you run before
      // trusting an LSH threshold. The engine's own q31 signatures are
      // reused; per-pair errors land on a 6-dp grid and fold in id
      // order; the report is one row.
      val docs = tbl(s, dir, "documents")
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text",
          k = 8, bands = 2, shingleN = 3)
        .select(col("doc_id"), col("signature"))
      val sh = docs.select(col("doc_id"),
          array_distinct(
            graft.plans.TextKernels.wordShinglesNative(col("text"), 3)).as("g"))
        .filter(size(col("g")) > 0)
      val a = sh.join(sig, Seq("doc_id"))
        .select(col("doc_id").as("id_a"), col("g").as("ga"), col("signature").as("sa"))
      val b = sh.join(sig, Seq("doc_id"))
        .select(col("doc_id").as("id_b"), col("g").as("gb"), col("signature").as("sb"))
      val pairs = a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"),
          round(abs(
            aggregate(zip_with(col("sa"), col("sb"),
              (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
              .cast("double") / lit(8.0) -
            size(array_intersect(col("ga"), col("gb"))).cast("double") /
              size(array_union(col("ga"), col("gb"))).cast("double")), 6)
            .as("err"))
      pairs.agg(count(lit(1)).as("n_pairs"),
          aggregate(array_sort(collect_list(struct(col("id_a"), col("err")))),
            lit(0.0), (acc, e) => acc + e.getField("err")).as("sum_err"),
          max(col("err")).as("max_abs_err"))
        .select(col("n_pairs"),
          round(col("sum_err") / col("n_pairs").cast("double"), 6)
            .as("avg_abs_err"),
          col("max_abs_err"))
    }),

    "q194_lang_entropy" -> ((s, dir) => {
      // Per-source language-mix entropy (−Σ p·ln p over the language
      // distribution) — the mix-health number a multilingual corpus card
      // reports. One (source, lang) count, source-sized tails, terms on
      // the 6-dp grid folded in language order.
      val lc = tbl(s, dir, "documents")
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val st = lc.groupBy(col("source")).agg(sum(col("cnt")).as("tot"))
      val p = col("cnt").cast("double") / col("tot").cast("double")
      lc.join(st, Seq("source"))
        .select(col("source"), col("lang"), col("tot"),
          round(-(p * log(p)), 6).as("term"))
        .groupBy(col("source"), col("tot"))
        .agg(count(lit(1)).as("n_langs"),
          round(aggregate(array_sort(collect_list(struct(col("lang"), col("term")))),
            lit(0.0), (acc, e) => acc + e.getField("term")), 4).as("entropy"))
        .select(col("source"), col("tot").as("n_docs"), col("n_langs"),
          col("entropy"))
    }),

    "q195_token_gini" -> ((s, dir) => {
      // Vocabulary-concentration Gini per source over token frequencies:
      // G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with frequencies ranked
      // ascending — EXACT BIGINT numerator/denominator, one double
      // division. The rank window partitions per source over the VOCAB
      // (never the token stream); equal-frequency ties are order-
      // invariant in the formula but still tie-broken by term for
      // determinism.
      val tf = tbl(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("source"), col("term")).agg(count(lit(1)).as("x"))
      val idx = tf.withColumn("i", row_number()
        .over(Window.partitionBy(col("source")).orderBy(col("x"), col("term")))
        .cast("long"))
      idx.groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("i") * col("x")).as("a"))
        .select(col("source"), col("n").as("n_terms"), col("sx").as("n_tokens"),
          round((lit(2L) * col("a") - (col("n") + 1) * col("sx")).cast("double") /
            (col("n") * col("sx")).cast("double"), 6).as("gini"))
    }),

    "q196_lsh_pr_curve" -> ((s, dir) => {
      // LSH operating-point curve: precision/recall of the q31 MinHash
      // candidate set against EXACT Jaccard ground truth at three
      // thresholds — the evaluation that picks bands/rows before a
      // production dedup run. Composes BOTH scale lessons:
      //  - q173's EXACT-DUP COLLAPSE: Jaccard and band keys depend only
      //    on the text, so truth (exact PPJoin, loosest threshold once)
      //    and candidates are computed on md5-text equivalence classes
      //    and every pair count is a MULTIPLICITY-WEIGHTED sum
      //    (cnt_a·cnt_b cross-class, C(cnt,2) same-class with J = 1) —
      //    the first cut without this ran 15× superlinear at sf1;
      //  - tighter thresholds are integer re-filters of (inter, uni).
      // The oracle recomputes doc-level brute force, independently
      // proving both the prefix filter and the collapse exact.
      import s.implicits._
      val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      val canon = docs.select(col("doc_id"), md5(col("text")).as("h"))
      val groups = canon.groupBy(col("h"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("cnt"))
        .localCheckpoint()
      val repDocs = docs.join(groups, docs("doc_id") === groups("rep_id"))
        .select(col("rep_id").as("doc_id"), col("text"), col("cnt"))
        .localCheckpoint()
      val shingled = repDocs.select(col("doc_id"),
          graft.plans.TextKernels.wordShinglesNative(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      // Class multiplicities for shingle-eligible classes (≥3 tokens —
      // the same universe truth and candidates live in).
      val elig = shingled.select(col("doc_id"))
        .join(repDocs.select(col("doc_id"), col("cnt")), Seq("doc_id"))
      val withinW = elig.agg(
        coalesce(sum(expr("div(cnt * (cnt - 1), 2)")), lit(0L)).as("w"))
      val mult = repDocs.select(col("doc_id"), col("cnt"))
      val truth = Dedup.jaccardJoin(shingled, "doc_id", "sh", tNum = 3, tDen = 10)
        .join(mult.select(col("doc_id").as("id_a"), col("cnt").as("ca")), Seq("id_a"))
        .join(mult.select(col("doc_id").as("id_b"), col("cnt").as("cb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
          (col("ca") * col("cb")).as("w"))
        .localCheckpoint()
      val cand = Dedup.minhashCandidatePairs(
          repDocs.select(col("doc_id"), col("text")), "doc_id", "text",
          k = 8, bands = 2, shingleN = 3)
        .join(mult.select(col("doc_id").as("id_a"), col("cnt").as("ca")), Seq("id_a"))
        .join(mult.select(col("doc_id").as("id_b"), col("cnt").as("cb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), (col("ca") * col("cb")).as("w"))
        .localCheckpoint()
      val th = Seq((3, 10), (1, 2), (7, 10)).toDF("tn", "td")
      val truthCounts = th.crossJoin(truth)
        .filter(col("inter") * col("td") >= col("uni") * col("tn"))
        .groupBy(col("tn"), col("td")).agg(sum(col("w")).as("cross_truth"))
      val candTruth = cand.drop("w").join(truth, Seq("id_a", "id_b"))
      val hits = th.crossJoin(candTruth)
        .filter(col("inter") * col("td") >= col("uni") * col("tn"))
        .groupBy(col("tn"), col("td")).agg(sum(col("w")).as("cross_hits"))
      val nCand = cand.agg(coalesce(sum(col("w")), lit(0L)).as("cross_cand"))
      th.join(truthCounts, Seq("tn", "td"), "left")
        .join(hits, Seq("tn", "td"), "left")
        .crossJoin(broadcast(nCand))
        .crossJoin(broadcast(withinW.select(col("w").as("within"))))
        .select(col("tn"), col("td"),
          (coalesce(col("cross_truth"), lit(0L)) + col("within")).as("n_truth"),
          (col("cross_cand") + col("within")).as("n_cand"),
          (coalesce(col("cross_hits"), lit(0L)) + col("within")).as("hits"))
        .select(col("tn"), col("td"), col("n_truth"), col("n_cand"), col("hits"),
          round(col("hits").cast("double") / col("n_cand").cast("double"), 6)
            .as("prec"),
          round(col("hits").cast("double") / col("n_truth").cast("double"), 6)
            .as("recall"))
    }),

    "q197_skew_report" -> ((s, dir) => {
      // Join-skew diagnostic: the 10 hottest l_partkey values with their
      // load relative to the mean key load — the report you read before
      // choosing salting (q73) or AQE skew handling for a join. One
      // map-combinable key count; the mean rides a 1-row crossJoin; the
      // top-10 is TakeOrderedAndProject.
      val keyCnt = tbl(s, dir, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val stats = keyCnt.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"))
      keyCnt.crossJoin(broadcast(stats))
        .select(col("l_partkey"), col("cnt"),
          round(col("cnt").cast("double") /
            (col("n_rows").cast("double") / col("n_keys").cast("double")), 4)
            .as("rel_load"))
        .orderBy(col("cnt").desc, col("l_partkey")).limit(10)
    }),

    "q198_catalog_stats" -> ((s, dir) => {
      // Catalog statistics sweep (the ANALYZE TABLE numbers a cost-based
      // optimizer feeds on): row count + distinct primary-key count per
      // table, one scan each, unioned into a 10-row catalog. Each leg is
      // a partial-aggregable count + approx-free exact distinct.
      val pks = Seq(
        "region" -> "r_regionkey", "nation" -> "n_nationkey",
        "customer" -> "c_custkey", "supplier" -> "s_suppkey",
        "part" -> "p_partkey", "orders" -> "o_orderkey",
        "lineitem" -> "l_orderkey", "events" -> "event_id",
        "documents" -> "doc_id", "embeddings" -> "vec_id")
      pks.map { case (t, pk) =>
        tbl(s, dir, t).agg(count(lit(1)).as("n_rows"),
            countDistinct(col(pk)).as("n_distinct_pk"))
          .select(lit(t).as("table_name"), lit(pk).as("pk"),
            col("n_rows"), col("n_distinct_pk"))
      }.reduce(_.unionByName(_))
    }),

    "q199_yoy_growth" -> ((s, dir) => {
      // Time-intelligence classic: monthly revenue with year-over-year
      // growth via lag-12 over the MONTH-bounded series (the corpus
      // collapses to ~84 month rows first; the window never sees order
      // rows). Revenue stays DECIMAL through the sum; growth is one
      // double division; the first year is null in both engines.
      val m = tbl(s, dir, "orders")
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          col("o_totalprice").cast(dec).as("tp"))
        .groupBy(col("month")).agg(sum(col("tp")).as("rev"))
      // Positional lag(12) without a window: triangular rank over the
      // month-bounded series, then a self-join on t−12 (exactly lag's
      // semantics, null for the first year in both engines).
      val ranked = operators.ScalableWindow.boundedRankCum(
        m, Seq(("month", true)), "t").localCheckpoint()
      val prev = ranked.select((col("t") + 12).as("t"), col("rev").as("prev"))
      ranked.join(broadcast(prev), Seq("t"), "left")
        .select(col("month"), col("rev").cast("double").as("revenue"),
          round(col("rev").cast("double") / col("prev").cast("double")
            - lit(1.0), 6).as("yoy_growth"))
    }),

    "q200_pareto_revenue" -> ((s, dir) => {
      // Revenue-concentration (80/20) report: how many customers carry
      // 80% of revenue. The cumulative window runs over the CUSTOMER
      // aggregate (approx-quantile cut-in is the 100 TB knob, q146/q182
      // pairing); the 80% membership test is an EXACT DECIMAL compare —
      // (cum − rev)·10 < total·8 — so no float sits on the boundary.
      val cust = tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice").cast(dec).as("tp"))
        .groupBy(col("o_custkey"))
        .agg((sum(col("tp")) * 100).cast("long").as("rev_c"))
        .localCheckpoint()
      val w = Window.orderBy(col("rev_c").desc, col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = cust.withColumn("cum_c", sum(col("rev_c")).over(w))
      val tot = cust.agg(sum(col("rev_c")).as("total_c"), count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(tot))
        .select(col("n"), col("total_c"),
          when((col("cum_c") - col("rev_c")) * 10 < col("total_c") * 8, 1L)
            .otherwise(0L).as("in80"))
        .groupBy(col("n"), col("total_c"))
        .agg(sum(col("in80")).as("n_top80"))
        .select(col("n").as("n_customers"), col("n_top80"),
          round(col("n_top80").cast("double") / col("n").cast("double"), 6)
            .as("top80_frac"),
          round(col("total_c").cast("double") / lit(100.0), 2)
            .as("total_revenue"))
    }),

    "q201_top_brands_per_nation" -> ((s, dir) => {
      // The classic "top-N per group" report — top-3 part brands by
      // revenue per customer nation — through the native TopKPerKey
      // operator (k-bounded per map partition, no per-nation sort, no
      // window over the rollup). Revenue stays DECIMAL through the sum
      // and converts to cents for a total-order integer sort key.
      val li = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          (col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec))).as("rev"))
      val o = tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val rolled = li
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(p, li("l_partkey") === p("p_partkey"))
        .groupBy(col("n_name").as("nation"), col("p_brand").as("brand"))
        .agg(sum(col("rev")).as("rev"))
      // Order on the EXACT decimal (cents truncation vs rounding differs
      // across engines); the double conversion happens only at output.
      org.apache.spark.sql.graft.TopKPerKey(rolled,
          Seq("nation"), Seq(("rev", false), ("brand", true)), k = 3)
        .select(col("nation"), col("brand"),
          round(col("rev").cast("double"), 2).as("revenue"))
    }),

    "q202_fk_audit" -> ((s, dir) => {
      // Referential-integrity audit: orphan counts for every lineitem
      // foreign key (order, part, supplier) plus orders→customer — the
      // data-quality gate an ETL load runs before publishing. Each leg
      // is one distinct-key anti-join (key-sized builds); the report is
      // 4 rows.
      import s.implicits._
      val li = tbl(s, dir, "lineitem")
      val legs = Seq(
        ("lineitem.l_orderkey -> orders",
          li.select(col("l_orderkey").as("k")),
          tbl(s, dir, "orders").select(col("o_orderkey").as("k"))),
        ("lineitem.l_partkey -> part",
          li.select(col("l_partkey").as("k")),
          tbl(s, dir, "part").select(col("p_partkey").as("k"))),
        ("lineitem.l_suppkey -> supplier",
          li.select(col("l_suppkey").as("k")),
          tbl(s, dir, "supplier").select(col("s_suppkey").as("k"))),
        ("orders.o_custkey -> customer",
          tbl(s, dir, "orders").select(col("o_custkey").as("k")),
          tbl(s, dir, "customer").select(col("c_custkey").as("k"))))
      legs.map { case (name, fk, pk) =>
        fk.join(pk, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"),
            countDistinct(col("k")).as("n_orphan_keys"))
          .select(lit(name).as("fk"), col("n_orphans"), col("n_orphan_keys"))
      }.reduce(_.unionByName(_))
    }),

    "q203_pareto_scaled" -> ((s, dir) => {
      // q200's 80/20 report with the scale knob AS CODE: the global
      // cumulative window (one task over every customer at 100 TB) is
      // replaced by ScalableWindow.bandedCumSum — approx-percentile
      // bands, partitioned within-band cumsum, broadcast band offsets —
      // which is EXACT, so this shares q200's oracle verbatim and
      // PlanSpec proves the plan has no unpartitioned Window. q200 stays
      // as the exact-window oracle face; this is the plan you'd run.
      val cust = tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice").cast(dec).as("tp"))
        .groupBy(col("o_custkey"))
        .agg((sum(col("tp")) * 100).cast("long").as("rev_c"))
        .localCheckpoint()
      val ranked = operators.ScalableWindow.bandedCumSum(cust,
        bandOn = "rev_c", descending = true, tieBreakers = Seq("o_custkey"),
        sumCol = "rev_c", out = "cum_c")
      val tot = cust.agg(sum(col("rev_c")).as("total_c"), count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(tot))
        .select(col("n"), col("total_c"),
          when((col("cum_c") - col("rev_c")) * 10 < col("total_c") * 8, 1L)
            .otherwise(0L).as("in80"))
        .groupBy(col("n"), col("total_c"))
        .agg(sum(col("in80")).as("n_top80"))
        .select(col("n").as("n_customers"), col("n_top80"),
          round(col("n_top80").cast("double") / col("n").cast("double"), 6)
            .as("top80_frac"),
          round(col("total_c").cast("double") / lit(100.0), 2)
            .as("total_revenue"))
    }),

    "q204_quantile_scaled" -> ((s, dir) => {
      // q182's quantile normalization with BOTH skew knobs as code
      // (sharing q182's oracle verbatim — the rewrite is exact):
      //  - the per-source rank no longer funnels each source's full doc
      //    set through one window partition: rank r = (count of strictly
      //    smaller values in the source, off the distinct-value grid) +
      //    (row_number among the value's ties, partitioned by
      //    (source, value) — tie-group-sized, never source-sized);
      //  - the corpus-wide value-grid cumsum runs through
      //    ScalableWindow.bandedCumSum instead of an unpartitioned
      //    window. PlanSpec asserts no empty Window.partitionSpec.
      val d = tbl(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars").as("x"))
      val ns_ = d.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val ntot = d.agg(count(lit(1)).as("n"))
      // Per-source grid: strictly-smaller cumulative count per value.
      // The grid window is partitioned by source AND distinct-value-
      // sized (bounded by the n_chars domain, not the corpus).
      val gs = d.groupBy(col("source"), col("x")).agg(count(lit(1)).as("c"))
        .withColumn("pcum_s",
          sum(col("c")).over(Window.partitionBy(col("source"))
            .orderBy(col("x"))) - col("c"))
        .drop("c")
      val r = d
        .withColumn("tie", row_number()
          .over(Window.partitionBy(col("source"), col("x"))
            .orderBy(col("doc_id"))).cast("long"))
        .join(gs, Seq("source", "x"))
        .withColumn("r", col("pcum_s") + col("tie"))
      val tt = r.join(broadcast(ns_), Seq("source"))
        .crossJoin(broadcast(ntot))
        .withColumn("t", expr("div(r * n + n_s - 1, n_s)"))
      val grid0 = d.groupBy(col("x").as("gx")).agg(count(lit(1)).as("c"))
      val grid = operators.ScalableWindow.bandedCumSum(grid0,
          bandOn = "gx", descending = false, tieBreakers = Nil,
          sumCol = "c", out = "ccum")
        .withColumn("pcum", col("ccum") - col("c"))
      tt.join(broadcast(grid),
          col("t") > col("pcum") && col("t") <= col("ccum"))
        .select(col("doc_id"), col("source"), col("x"), col("gx").as("norm_x"))
    }),

    "q155_dedup_impact" -> ((s, dir) => {
      // Dataset-card "what did dedup do" report: per-source doc and
      // token counts before vs after the q136 keep-list, with keep
      // rates — the numbers a curation run publishes. Composes q136's
      // survivor policy verbatim (LSH pairs → CC → quality-argmax
      // survivor) plus ONE corpus scan for token counts; keep-list
      // joins are by id and the output is source-sized.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val pairs = Similarity.nearDuplicatePairs(e, "vec_id", "embedding",
        nPlanes = 4, dim = dim, threshold = 0.3).select("id_a", "id_b")
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val qual = tbl(s, dir, "documents").select(col("doc_id"),
        Text.qualityScore(col("text"), Text.tokens(col("text"))).as("q"))
      val surv = cc.join(qual, cc("vertex") === qual("doc_id"))
        .groupBy(col("component"))
        .agg(min(struct((-col("q")).as("nq"), col("doc_id").as("id"))).as("m"))
        .select(col("m.id").as("survivor_doc_id"))
      val toks = tbl(s, dir, "documents").select(col("doc_id"), col("source"),
        size(Text.tokens(col("text"))).cast("bigint").as("n_tok"))
      toks
        .join(cc, toks("doc_id") === cc("vertex"), "left")
        .join(surv, toks("doc_id") === surv("survivor_doc_id"), "left")
        .withColumn("kept",
          col("vertex").isNull || col("survivor_doc_id").isNotNull)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs_before"),
          sum(col("n_tok")).as("tokens_before"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("docs_after"),
          sum(when(col("kept"), col("n_tok")).otherwise(0L))
            .as("tokens_after"))
        .select(col("source"), col("docs_before"), col("docs_after"),
          col("tokens_before"), col("tokens_after"),
          round(col("docs_after").cast("double") / col("docs_before"), 6)
            .as("doc_keep_rate"),
          round(col("tokens_after").cast("double") / col("tokens_before"), 6)
            .as("token_keep_rate"))
    }),

    "q156_contamination_curve" -> ((s, dir) => {
      // Decontamination threshold curve: how many train docs would be
      // flagged at each ≥t shared-shingle cutoff — the sweep that picks
      // q138's operating point before committing to a removal pass.
      // Same split, shingles, and df-cap as q78/q138 so the three
      // compose measure → sweep → act. Scale shape: the per-doc shared
      // count is the q138 equi-join; the sweep is an explode over the
      // 4-element threshold literal on the doc-count-sized shared table
      // (never the corpus), collapsing to a 4-row report.
      import s.implicits._
      val sh = tbl(s, dir, "documents").select(col("doc_id"),
        explode(array_distinct(
          graft.plans.TextKernels.wordShinglesNative(col("text"), 3)))
          .as("shingle"))
      val ev = sh.filter(col("doc_id") < 50).select(col("shingle")).distinct()
      val tr = sh.filter(col("doc_id") >= 50)
      val rare = tr.groupBy(col("shingle"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") <= 64).select(col("shingle"))
      val shared = tr
        .join(rare, Seq("shingle"), "left_semi")
        .join(ev, Seq("shingle"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      val ths = array(lit(1), lit(2), lit(4), lit(8))
      val fl = shared
        .select(explode(filter(ths, t => col("n_shared") >= t)).as("threshold"))
        .groupBy(col("threshold")).agg(count(lit(1)).as("n_flagged"))
      val tot = tbl(s, dir, "documents").filter(col("doc_id") >= 50)
        .agg(count(lit(1)).as("n_train"))
      Seq(1, 2, 4, 8).toDF("threshold")
        .join(fl, Seq("threshold"), "left")
        .crossJoin(broadcast(tot))
        .select(col("threshold"),
          coalesce(col("n_flagged"), lit(0L)).as("n_flagged"), col("n_train"),
          round(coalesce(col("n_flagged"), lit(0L)).cast("double") /
            col("n_train"), 6).as("flagged_frac"))
    }),

    "q86_pii_redaction" -> ((s, dir) => {
      // The corpus tables carry no PII by construction, so contact text
      // is synthesized deterministically per customer (q81 precedent:
      // both engines build identical strings), then redacted by the
      // codegen'd kernel. Scan-local projection — zero shuffles.
      // c_name's own 9-digit run is a deliberate phone-pattern hit.
      val key7 = lpad(col("c_custkey").cast("string"), 7, "0")
      val text = concat(
        col("c_name"), lit(" <user"), col("c_custkey").cast("string"),
        lit("@example.com>"),
        when(col("c_custkey") % 3 === 0,
          concat(lit(" tel 555-"), key7)).otherwise(lit("")),
        when(col("c_custkey") % 5 === 0,
          concat(lit(" ip 10.0."), (col("c_custkey") % 256).cast("string"),
            lit(".7"))).otherwise(lit("")))
      tbl(s, dir, "customer").select(
        col("c_custkey"),
        Redaction.redactAll(text).as("redacted"),
        Redaction.matchCount(text, Redaction.EmailPattern).as("n_emails"),
        Redaction.matchCount(text, Redaction.PhonePattern).as("n_phones"),
        Redaction.matchCount(text, Redaction.Ipv4Pattern).as("n_ips"))
    }),
    "q87_salient_terms" -> ((s, dir) => {
      // Per-doc most salient term by tf × (N/df) — ratio IDF, not ln:
      // bit-exact cross-engine where ln is only correctly-rounded-ish.
      // Plan: one (doc, term) shuffle for tf; df DERIVED from tf (partial
      // agg, vocabulary-sized result, broadcast back); top term per doc
      // via min(struct(-score, term)) — map-side partial aggregation
      // with a deterministic tie-break (highest score, then first term),
      // where a row_number window would shuffle and sort.
      val docs = tbl(s, dir, "documents")
      // tf feeds BOTH df_ and the join: materialize it once (the q78
      // rule for multiply-referenced subtrees), with the explode spread
      // off the single local file first.
      val tf = docs
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(broadcast(df_), Seq("term")).crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          (col("tf").cast("double") *
            (col("n_docs").cast("double") / col("df").cast("double")))
            .as("score"))
        .groupBy(col("doc_id"))
        .agg(min(struct((-col("score")).as("neg"), col("term").as("term")))
          .as("m"))
        .select(col("doc_id"),
          col("m").getField("term").as("top_term"),
          (-col("m").getField("neg")).as("tfidf"))
    }),

    "q89_heavy_hitters" -> ((s, dir) =>
      // SpaceSaving heavy-hitters per language (O(capacity) state per
      // group at any corpus size). Capacity 64 >= the ~20 distinct
      // sources, so the sketch is in its EXACT regime and the oracle
      // checks the counts themselves — the KMV/q75 pattern.
      tbl(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(graft.plans.SketchAggregates.heavyHitters(col("source"), 64)
          .as("hh"))
        .select(col("lang"), explode(slice(col("hh"), 1, 3)).as("h"))
        .select(col("lang"), col("h.term").as("source"),
          col("h.cnt").as("cnt"))),

    "q94_dup_spans" -> ((s, dir) => {
      // Exact duplicated-substring coverage (the suffix-array dedup
      // measure of Lee et al.'s "Deduplicating Training Data", computed
      // the distributed way): every char position starts a 20-gram;
      // positions whose gram recurs in ANOTHER doc are duplicated
      // coverage. One explode + one gram groupBy + one semi-join — the
      // 100 TB knobs (xxhash64 8-byte gram keys, hot-gram df cap) are
      // implemented and oracle-proven on the REMOVAL operator
      // (Dedup.removeDuplicateSpans gramKeyHash/maxDocFreq, q121) and
      // apply to this measure identically.
      // Plan notes (probe-measured, 15 s -> 2 s at sf0.1): (a) grams come
      // from the one-pass CharGrams kernel — the compositional
      // explode(sequence)+substr form copies the full text into EVERY
      // position row; (b) the doc scan is repartitioned first — a single
      // parquet file otherwise pins the whole explode to ONE task;
      // (c) the dup test rides a window over the (gram, doc) aggregate
      // instead of a second gram explode + semi-join.
      val d = tbl(s, dir, "documents")
        .filter(length(col("text")) >= 20)
        .select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val grams = d.select(col("doc_id"),
        explode(graft.plans.TextKernels.charGramsNative(col("text"), 20)).as("gram"))
      val g1 = grams.groupBy(col("gram"), col("doc_id"))
        .agg(count(lit(1)).as("npos"))
      val nDocs = Window.partitionBy(col("gram"))
      val perDoc = g1.withColumn("nd", count(lit(1)).over(nDocs))
        .filter(col("nd") >= 2)
        .groupBy(col("doc_id")).agg(sum(col("npos")).as("dup_positions"))
      d.select(col("doc_id"), (length(col("text")) - 19).cast("long").as("total_grams"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("total_grams"),
          coalesce(col("dup_positions"), lit(0L)).as("dup_positions"))
    }),

    "q119_vocab_encode" -> ((s, dir) => {
      // Corpus vocabulary + token-id encoding (the tokenize step every
      // training pipeline runs): vocab = top-1000 tokens by (count
      // desc, token) — a deterministic total order — and each document
      // becomes its ordered id sequence with OOV = 0, emitted as a
      // space-joined string (the oracle comparator hashes scalars, not
      // arrays). The top-k is `orderBy(...).limit(1000)` — Spark plans
      // TakeOrderedAndProject (per-partition top-k, driver merge), so
      // the corpus-sized distinct-token table is NEVER funneled through
      // one partition; only the 1000-row dictionary sees a window. The
      // vocab join is a broadcast (always dictionary-sized); order
      // inside each document is restored by sorting the (pos, id)
      // structs, so no window shuffle touches the token stream either.
      val d = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      val toks = d.select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")))
        .select(col("doc_id"), col("pos"), col("col").as("token"))
      val top = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(1000)
      // Vocab ids over the post-limit 1000-row head: triangular rank
      // (q153 rule), never an unpartitioned window.
      val vocab = operators.ScalableWindow.boundedRankCum(top,
          Seq(("cnt", false), ("token", true)), "token_id")
        .select(col("token"), col("token_id").cast("int").as("token_id"))
      toks.join(broadcast(vocab), Seq("token"), "left")
        .select(col("doc_id"), col("pos"),
          coalesce(col("token_id"), lit(0)).as("tid"))
        .groupBy(col("doc_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          e => e("tid").cast("string")), " ").as("token_ids"))
    }),

    "q118_dedup_spans" -> ((s, dir) =>
      // Exact duplicated-substring REMOVAL (the action q94 only
      // measures): see Dedup.removeDuplicateSpans for the distributed
      // shape and the q94 lessons it inherits.
      Dedup.removeDuplicateSpans(
        tbl(s, dir, "documents"), "doc_id", "text", gramLen = 20)),

    "q120_search_index_e2e" -> ((s, _) => {
      // The composed entity DAG end-to-end under the oracle hash — the
      // last un-oracled seam (entities are spec-tested one by one; this
      // hash-checks their COMPOSITION): stage the canonical two-provider
      // fixture, run the REAL registry through PipelineRunner to
      // search_index (reference entities_registry.py:623-691), and
      // project the SQL-replayable scalar columns. Arrays are joined to
      // strings for the comparator; xxhash64 surrogate ids and
      // to_json-built columns are excluded (DuckDB can reproduce
      // neither byte-for-byte). The oracle replays the whole chain —
      // TSV/YAML/JSON/OBO parse, dims, patient/model joins, the 4-key
      // diagnosis-mapping join, the recursive ontology ancestor
      // closure, display renames, scoring — from the SAME staged files.
      val work = "/root/repo/target/q120_fixtures"
      graft.examples.PdcmFull.stageExampleProviders(work)
      val si = new graft.pipeline.PipelineRunner(
        s, graft.pdcm.PdcmEntities.registry(),
        graft.pdcm.PdcmEntities.sources(s, work))
        .run(Seq("search_index"))("search_index")
      si.select(
        col("external_model_id"), col("data_source"),
        col("patient_id"), col("patient_sex"), col("patient_history"),
        col("patient_ethnicity"),
        col("patient_age_at_initial_diagnosis"),
        col("patient_age_category"), col("patient_age"),
        col("patient_sample_id"), col("primary_site"), col("collection_site"),
        col("tumour_type"), col("cancer_stage"), col("cancer_grade"),
        col("histology"),
        array_join(col("search_terms"), "|").as("search_terms"),
        col("cancer_system"),
        array_join(col("dataset_available"), "|").as("dataset_available"),
        col("data_score"), col("metadata_score"),
        col("provider_name"), col("project_name"),
        col("license_name"), col("license_url"),
        col("model_type"), col("model_availability"), col("date_submitted"),
        // Treatment chain (protocol split -> ontology harmonisation ->
        // regimen expansion/discovery -> per-model aggregation): the
        // deepest transform path in the registry, arrays joined for the
        // comparator. Null (no protocol rows for the model) stays
        // distinct from '' (protocols present, none harmonised).
        array_join(col("model_treatments"), "|").as("model_treatments"),
        array_join(col("model_treatments_responses"), "|")
          .as("model_treatments_responses"),
        array_join(col("patient_treatments"), "|").as("patient_treatments"),
        array_join(col("patient_treatments_responses"), "|")
          .as("patient_treatments_responses"),
        array_join(col("custom_treatment_type_list"), "|")
          .as("custom_treatment_type_list"))
    }),

    "q121_dedup_spans_hash" -> ((s, dir) =>
      // The 100 TB shuffle shape of q118: grams grouped by their
      // xxhash64 (8-byte shuffle keys instead of 20-char strings) under
      // a doc-frequency cap set high enough to be inert at this scale —
      // proving the scale knobs reproduce the exact path bit-for-bit
      // (the oracle row is the same SQL as q118).
      Dedup.removeDuplicateSpans(
        tbl(s, dir, "documents"), "doc_id", "text", gramLen = 20,
        gramKeyHash = true, maxDocFreq = Some(1000000))),

    "q122_semantic_dedup" -> ((s, dir) =>
      // SemDeDup over the embedding table: deterministic 2-iteration
      // Lloyd k-means (8 cells, seeds = lowest-id vectors, per-iteration
      // centroid means rounded to 6 dp so both engines land on the same
      // grid), then within-cell cosine >= 0.42 against a lower-id member
      // marks a semantic duplicate. See Dedup.semanticDedup for the
      // determinism contract and the 100 TB shuffle shape.
      Dedup.semanticDedup(tbl(s, dir, "embeddings"), "vec_id", "embedding",
        nCells = 8, lloydIters = 2, simThreshold = 0.42)),

    "q123_bm25" -> ((s, dir) => {
      // BM25 retrieval scoring (k1=1.2, b=0.75) for a fixed 3-term query
      // — the retrieval primitive a training-data pipeline uses for
      // benchmark-decontamination lookups and RAG corpus probes.
      // Scale shape: the term filter runs BEFORE the (doc, term) shuffle,
      // so tf aggregation carries query-term tokens only (matching docs ×
      // |q| rows, not the corpus token stream); doc length is a
      // scan-local projection feeding one corpus-stats row; df and stats
      // broadcast back onto tf; the final top-10 is TakeOrderedAndProject,
      // never a global sort. Determinism: per-term components rounded to
      // 6 dp, then summed in term order via an ordered fold
      // (array_sort(collect_list) → aggregate), mirroring DuckDB
      // list_sum(list(... ORDER BY term)) — same grid, same fold order
      // (the q87 ratio-IDF lesson extended to ln via rounding; the idf
      // argument is > 1, so scores are positive and no-match docs can
      // never reach the top 10).
      val qTerms = Seq("spark", "merge", "window")
      val docs = tbl(s, dir, "documents")
      val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      // dl feeds BOTH the corpus stats and the scoring join, and tf
      // feeds BOTH df and the join — pin each (the q87 rule for
      // multiply-referenced subtrees), so the corpus text is scanned
      // exactly twice and each pinned frame is doc-count-sized
      // (two ints / a few matched terms per doc, not the token stream).
      val dl = toks.select(col("doc_id"), size(col("toks")).as("dl"))
        .localCheckpoint()
      val stats = dl.agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))
      val tf = toks
        .select(col("doc_id"), explode(col("toks")).as("term"))
        .filter(col("term").isin(qTerms: _*))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val comp = round(
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))), 6)
      tf.join(broadcast(df_), Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          struct(col("term").as("term"), comp.as("comp")).as("tc"))
        .groupBy(col("doc_id"))
        .agg(aggregate(array_sort(collect_list(col("tc"))), lit(0.0),
          (acc, x) => acc + x.getField("comp")).as("sc"))
        .select(col("doc_id"), round(col("sc"), 4).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(10)
    }),

    "q125_perplexity_filter" -> ((s, dir) => {
      // CCNet-style perplexity quality filter with a corpus unigram LM
      // as the deterministic stand-in for KenLM: p(t) = cnt(t)/total,
      // doc score = mean over positions of -ln p(token), keep = score
      // below threshold (the high-perplexity tail is the noise a
      // curation pipeline drops). Scale shape: ONE corpus scan feeds the
      // pinned (doc, pos, term) stream; the LM is a vocab-sized partial
      // agg of it, joined back BY TERM (Catalyst broadcasts while the LM
      // fits, shuffles when the vocabulary outgrows it); per-doc order
      // is restored by sorting (pos, lp) structs — no window touches the
      // token stream. Determinism: -ln p on a 6-dp grid, summed in
      // position order via the same ordered fold as q123.
      val pos = tbl(s, dir, "documents")
        .select(col("doc_id"), posexplode(Text.tokens(col("text"))))
        .select(col("doc_id"), col("pos"), col("col").as("term"))
        .localCheckpoint()
      val lm = pos.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val total = lm.agg(sum(col("cnt")).as("total"))
      val lp = lm.crossJoin(broadcast(total)).select(col("term"),
        round(-log(col("cnt").cast("double") / col("total")), 6).as("lp"))
      pos.join(lp, Seq("term"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          aggregate(array_sort(collect_list(struct(col("pos"), col("lp")))),
            lit(0.0), (a, x) => a + x.getField("lp")).as("nll"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("nll") / col("n_tokens"), 4).as("avg_neg_logp"),
          (col("nll") / col("n_tokens") <= lit(3.45)).as("keep"))
    }),

    "q126_pmi_collocations" -> ((s, dir) => {
      // PMI collocation mining (phrase discovery over the corpus):
      // pmi(a,b) = ln(p(ab) / (p(a)·p(b))) over adjacent token pairs,
      // top-20 by PMI among pairs seen >= 5 times. Scale shape: two
      // corpus scans (unigram explode; shingle explode), each collapsing
      // scan-locally into a vocab-/pair-type-sized partial agg before
      // any join; both count tables are pinned once (multiply
      // referenced: totals + join legs) and the PMI joins run between
      // dictionary-sized frames that Catalyst broadcasts. The top-20 is
      // TakeOrderedAndProject. Determinism: one round(ln(ratio of exact
      // counts), 4) per pair — no float accumulation at all.
      val docs = tbl(s, dir, "documents")
      val uni = docs.select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val biAll = docs.select(
          explode(graft.plans.TextKernels.wordShinglesNative(col("text"), 2))
            .as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("cnt_ab"))
        .localCheckpoint()
      val totU = uni.agg(sum(col("cnt")).as("tot_u"))
      val totB = biAll.agg(sum(col("cnt_ab")).as("tot_b"))
      val ua = uni.select(col("tok").as("wa"), col("cnt").as("cnt_a"))
      val ub = uni.select(col("tok").as("wb"), col("cnt").as("cnt_b"))
      biAll.filter(col("cnt_ab") >= 5)
        .withColumn("wa", split(col("bigram"), " ").getItem(0))
        .withColumn("wb", split(col("bigram"), " ").getItem(1))
        .join(ua, Seq("wa")).join(ub, Seq("wb"))
        .crossJoin(broadcast(totU)).crossJoin(broadcast(totB))
        .select(col("bigram"), col("cnt_ab"),
          round(log((col("cnt_ab").cast("double") / col("tot_b")) /
            ((col("cnt_a").cast("double") / col("tot_u")) *
             (col("cnt_b").cast("double") / col("tot_u")))), 4).as("pmi"))
        .orderBy(col("pmi").desc, col("bigram"))
        .limit(20)
    }),

    "q124_dedup_survivors" -> ((s, dir) => {
      // Quality-aware near-dup survivor selection — the policy step after
      // q72's clustering: keep the HIGHEST-quality member of each near-dup
      // component (ties → lowest doc_id), the choice a curation pipeline
      // applies before dropping the rest. Components come from the
      // LSH-bucketed pair graph (candidate-bounded, never all-pairs);
      // quality is the q36 score joined by id; the survivor argmax is a
      // min(struct(-quality, id)) partial agg — map-side combinable, no
      // window, no sort, so the shuffle carries one row per component.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val pairs = Similarity.nearDuplicatePairs(e, "vec_id", "embedding",
        nPlanes = 4, dim = dim, threshold = 0.3).select("id_a", "id_b")
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val qual = tbl(s, dir, "documents").select(
        col("doc_id"),
        Text.qualityScore(col("text"), Text.tokens(col("text"))).as("q"))
      cc.join(qual, cc("vertex") === qual("doc_id"))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"),
          min(struct((-col("q")).as("nq"), col("doc_id").as("id"))).as("m"))
        .select(col("component"), col("m.id").as("survivor_doc_id"),
          col("n_members"), (-col("m.nq")).as("survivor_quality"))
    }),

    "q136_dedup_apply" -> ((s, dir) => {
      // The dedup ACTION composed end-to-end: q124 picks each near-dup
      // component's survivor; this query APPLIES the policy and emits the
      // kept corpus manifest — untouched docs tagged 'unique', component
      // survivors tagged 'survivor', everything else dropped. Scale
      // shape: the pair graph and components are LSH-candidate-bounded;
      // the survivor table is one row per component; both join back to
      // the corpus BY ID (broadcast while components fit, shuffled
      // equi-join beyond), so the corpus is scanned once and never
      // pairwise-compared here.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val pairs = Similarity.nearDuplicatePairs(e, "vec_id", "embedding",
        nPlanes = 4, dim = dim, threshold = 0.3).select("id_a", "id_b")
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val qual = tbl(s, dir, "documents").select(
        col("doc_id"),
        Text.qualityScore(col("text"), Text.tokens(col("text"))).as("q"))
      val surv = cc.join(qual, cc("vertex") === qual("doc_id"))
        .groupBy(col("component"))
        .agg(min(struct((-col("q")).as("nq"), col("doc_id").as("id"))).as("m"))
        .select(col("m.id").as("survivor_doc_id"))
      val docs = tbl(s, dir, "documents").select(col("doc_id"))
      docs
        .join(cc, docs("doc_id") === cc("vertex"), "left")
        .join(surv, docs("doc_id") === surv("survivor_doc_id"), "left")
        .filter(col("vertex").isNull || col("survivor_doc_id").isNotNull)
        .select(col("doc_id"),
          when(col("vertex").isNull, lit("unique"))
            .otherwise(lit("survivor")).as("status"))
    }),

    "q137_sentence_dedup" -> ((s, dir) => {
      // C4-style sentence-level dedup (Raffel et al. 2020 §2.2 dedups
      // three-sentence spans; here the unit is the sentence): every
      // repeated sentence keeps ONLY its canonical occurrence — lowest
      // (doc_id, position) corpus-wide — and documents are rebuilt from
      // their surviving sentences in order. Granularity sits between
      // q118 (char-gram spans) and q30 (whole documents). Scale shape:
      // one explode feeds a (sentence → min(doc,pos)) map-combinable
      // partial agg; the canonical table joins back BY SENTENCE (the
      // q118 gram-join shape — shuffled equi-join, hashable to 8-byte
      // keys the same way if sentences are long); per-doc rebuild is a
      // sorted-struct fold, no window on the sentence stream.
      val sent = tbl(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), "\\. ")))
        .select(col("doc_id"), col("pos"), col("col").as("sent"))
      val canon = sent.groupBy(col("sent"))
        .agg(min(struct(col("doc_id").as("d"), col("pos").as("p"))).as("c"))
      sent.join(canon, Seq("sent"))
        .select(col("doc_id"), col("pos"), col("sent"),
          (col("c.d") === col("doc_id") && col("c.p") === col("pos"))
            .cast("long").as("kept"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sents"), sum(col("kept")).as("n_kept"),
          // collect_list skips nulls: only kept sentences enter the fold.
          array_join(transform(array_sort(collect_list(
            when(col("kept") === 1, struct(col("pos"), col("sent"))))),
            e => e.getField("sent")), ". ").as("text_deduped"))
    }),

    "q142_quality_quantile" -> ((s, dir) => {
      // Per-source quality-quantile gate — the calibrated form of a fixed
      // quality threshold: keep each source's top quartile (quality >=
      // that source's exact P75). Pipelines calibrate per source because
      // quality distributions differ by origin; a single global cut
      // over- or under-prunes. Scale shape: quality is the q36 codegen'd
      // projection; the P75 is one exact-percentile agg collapsing to a
      // source-count-sized table that broadcasts back; the gate is one
      // filter — two corpus scans total (agg + gate), zero extra
      // shuffles of the corpus.
      val q = tbl(s, dir, "documents").select(col("doc_id"), col("source"),
        Text.qualityScore(col("text"), Text.tokens(col("text"))).as("quality"))
      val thr = q.groupBy(col("source"))
        .agg(percentile(col("quality"), lit(0.75)).as("p75"))
      q.join(broadcast(thr), Seq("source"))
        .filter(col("quality") >= col("p75"))
        .select(col("doc_id"), col("source"), col("quality"), col("p75"))
    }),

    "q141_mix_apply" -> ((s, dir) => {
      // The mixing plan APPLIED (q139 → corpus): each source's
      // water-filled token allocation becomes a per-doc acceptance rate
      // alloc/n_tokens, executed as the deterministic md5 unit-hash
      // filter (q76's idiom — replayable on any engine, stable under
      // retries). Scale shape: the rate table is source-count-sized and
      // broadcasts; the corpus is scanned once through one codegen'd
      // filter — the plan-to-sample path has zero extra shuffles.
      val st = tbl(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_tokens"))
      val rates = Sampling.waterFillBudget(st, "source", "n_tokens", budget = 26000L)
        .select(col("source"), (col("alloc") / col("n_tokens")).as("rate"))
      tbl(s, dir, "documents").select(col("doc_id"), col("source"))
        .join(broadcast(rates), Seq("source"))
        .filter(Sampling.unitHash(col("doc_id")) < col("rate"))
        .select(col("doc_id"), col("source"))
    }),

    "q140_topk_per_key" -> ((s, dir) =>
      // Native per-key top-k through the custom planner path (logical
      // node → strategy → two-phase physical operator): top-3 events per
      // type by (value desc, event_id) — the partial pass bounds each map
      // partition to k rows per key BEFORE the exchange, where the
      // window-based oracle shuffles and sorts every row. See
      // org.apache.spark.sql.graft.TopKPerKey.
      org.apache.spark.sql.graft.TopKPerKey(
        Tables.events(s, dir).select(col("event_type"), col("event_id"), col("value")),
        Seq("event_type"), Seq(("value", false), ("event_id", true)), k = 3)),

    "q138_decontaminate" -> ((s, dir) => {
      // Train-set decontamination — the ACTION on q78's measurement
      // (GPT-3-style n-gram overlap removal): every train doc is flagged
      // by how many of its shingles appear in the eval set, under q78's
      // boilerplate df-cap (a shingle in > 64 train docs is template
      // noise, not leakage — the skew killer at 100 TB). Same split and
      // shingle construction as q78, so the two queries compose into
      // measure → act. Scale shape: candidate generation is an equi-join
      // on the shingle key (never doc×doc); the verdict join back to the
      // train corpus is by id.
      val sh = tbl(s, dir, "documents").select(col("doc_id"),
        explode(array_distinct(
          graft.plans.TextKernels.wordShinglesNative(col("text"), 3)))
          .as("shingle"))
      val ev = sh.filter(col("doc_id") < 50).select(col("shingle")).distinct()
      val tr = sh.filter(col("doc_id") >= 50)
      val rare = tr.groupBy(col("shingle"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") <= 64).select(col("shingle"))
      val shared = tr
        .join(rare, Seq("shingle"), "left_semi")
        .join(ev, Seq("shingle"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("shingle")).as("n"))
      tbl(s, dir, "documents").filter(col("doc_id") >= 50)
        .select(col("doc_id"))
        .join(shared, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n"), lit(0L)).as("n_shared_shingles"),
          (coalesce(col("n"), lit(0L)) > 0).as("contaminated"))
    }),

    "q139_budget_alloc" -> ((s, dir) => {
      // Water-filling token-budget allocation across sources (the
      // UniMax idea, Chung et al. 2023): spread a fixed budget so every
      // source below the water level is fully used and the rest split
      // the remainder evenly — closed form over sources sorted by size:
      // k = max{i : sᵢ·(n−i+1) ≤ B − S_{i−1}}, level t = (B−S_k)/(n−k),
      // allocᵢ = sᵢ for i ≤ k else t. Scale shape: ONE corpus scan
      // collapses to a source-count-sized table; the windows that
      // follow run over that tiny frame (source-count rows — NOT the
      // corpus; the q119 global-window prohibition is about
      // corpus-sized streams), and the three scalars (n, k, S_k)
      // broadcast back. All-integer predicate; the level is one exact
      // division, rounded once.
      val st = tbl(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_tokens"))
      Sampling.waterFillBudget(st, "source", "n_tokens", budget = 26000L)
        .select(col("source"), col("n_tokens"),
          col("alloc").as("alloc_tokens"), col("fully_used"))
    }),

    "q127_kl_drift" -> ((s, dir) => {
      // Domain-distribution drift: KL(source ‖ corpus) over unigram
      // distributions — the monitoring signal a data-mixing pipeline
      // watches to spot a source whose token distribution has shifted
      // away from the blend. Scale shape: ONE corpus scan collapses
      // scan-locally into a (source, term) partial agg; corpus counts
      // derive from that frame (no second scan), so everything after the
      // first shuffle is (sources × vocab)-sized. Source totals are
      // source-count-sized and broadcast. Determinism: each term's
      // contribution p_s·ln(p_s/p_c) lands on a 6-dp grid, summed in
      // term order via the q123 ordered fold (per-group state is the
      // source's vocabulary, never the token stream).
      val st = tbl(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("source"), col("term")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val corpus = st.groupBy(col("term")).agg(sum(col("cnt")).as("ccnt"))
      val ctot = corpus.agg(sum(col("ccnt")).as("ctot"))
      val stot = st.groupBy(col("source")).agg(sum(col("cnt")).as("stot"))
      val kc = round(
        (col("cnt").cast("double") / col("stot")) *
          log((col("cnt").cast("double") / col("stot")) /
            (col("ccnt").cast("double") / col("ctot"))), 6)
      st.join(corpus, Seq("term"))
        .join(broadcast(stot), Seq("source"))
        .crossJoin(broadcast(ctot))
        .select(col("source"), col("stot"),
          struct(col("term"), kc.as("kc")).as("tc"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_terms"), max(col("stot")).as("n_tokens"),
          aggregate(array_sort(collect_list(col("tc"))), lit(0.0),
            (a, x) => a + x.getField("kc")).as("kl"))
        .select(col("source"), col("n_terms"), col("n_tokens"),
          round(col("kl"), 4).as("kl_vs_corpus"))
    }),

    "q128_vocab_coverage" -> ((s, dir) => {
      // Tokenizer-vocabulary coverage per source: the fraction of a
      // source's token stream covered by the top-k corpus vocabulary,
      // and its OOV rate — the acceptance test run before freezing a
      // tokenizer. Scale shape: the same (source, term) partial agg as
      // q127 feeds both legs; the vocabulary is orderBy+limit
      // (TakeOrderedAndProject — per-partition top-k, merged on the
      // driver, NEVER a global sort or single-partition window: the
      // q119 lesson); the dictionary-sized vocab broadcasts back onto
      // the (source, term) frame. Determinism: one ratio of exact
      // counts, rounded once.
      val st = tbl(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("source"), col("term")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val vocab = st.groupBy(col("term")).agg(sum(col("cnt")).as("tc"))
        .orderBy(col("tc").desc, col("term")).limit(10)
        .select(col("term"), lit(1).as("in_vocab"))
      st.join(broadcast(vocab), Seq("term"), "left")
        .groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_tokens"),
          sum(when(col("in_vocab") === 1, col("cnt")).otherwise(lit(0L)))
            .as("covered"))
        .select(col("source"), col("n_tokens"),
          round(col("covered").cast("double") / col("n_tokens"), 6)
            .as("coverage"),
          round(lit(1.0) - col("covered").cast("double") / col("n_tokens"), 6)
            .as("oov_rate"))
    }),

    "q129_ngram_novelty" -> ((s, dir) => {
      // Per-document n-gram novelty: the fraction of a document's word
      // trigram instances whose trigram occurs in NO other document —
      // the informativeness prior of dedup-aware sampling (a document
      // whose trigrams all recur elsewhere adds nothing the corpus
      // doesn't already say). Scale shape: one scan collapses to a
      // (doc, gram) partial agg; document frequency is a second
      // gram-keyed agg of that frame (distinct-doc counts come free
      // because the frame is already per-doc-distinct); the join back
      // is gram-keyed and candidate-bounded. No windows, no sorts —
      // ratios of exact counts, rounded once.
      // The gram string never leaves the scan: xxhash64(gram) is the
      // shuffle/join key (8-byte longs, not ~20-char strings — the q121
      // hash-gram lesson; doc-frequency counts are hash-collision-exact
      // for all practical purposes and the novelty ratio only needs
      // equality). The pinned (doc, gramHash) frame feeds both df and
      // the join back.
      val sh = tbl(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.plans.TextKernels.wordShinglesNative(col("text"), 3))
            .as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val df_ = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
      sh.join(df_, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_shingles"),
          sum(when(col("df") === 1, col("cnt")).otherwise(lit(0L)))
            .as("novel"))
        .select(col("doc_id"), col("n_shingles"),
          round(col("novel").cast("double") / col("n_shingles"), 6)
            .as("novelty"))
    }),

    "q130_hash_split" -> ((s, dir) => {
      // Deterministic train/val/test assignment by content-stable hash:
      // split = band of md5(doc_id) — a document's split NEVER changes
      // when the corpus grows or shrinks (the property row_number-range
      // splits lack, and the reason every production pipeline splits by
      // hash). Pure projection: zero shuffles at any corpus size; the
      // band compare is on the hex prefix, identical ASCII ordering in
      // both engines ('0d'/256 ≈ 5% test, next ≈ 5% val, rest train).
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          substring(md5(col("doc_id").cast("string")), 1, 2).as("bucket"))
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < "0d", lit("test"))
            .when(col("bucket") < "1a", lit("val"))
            .otherwise(lit("train")).as("split"))
    }),

    "q131_gopher_rules" -> ((s, dir) => {
      // Gopher-style rule-based quality filter (Rae et al. 2021, §A1.1):
      // word-count bounds, mean word length window, symbol-to-word ratio
      // (# and ellipsis), alphabetic-word fraction, and a stopword-presence
      // check — the cheap first gate a curation pipeline runs before any
      // model-based scoring. One codegen'd projection pass: every signal
      // derives from the text column in a single scan, zero shuffles at
      // any corpus size. Determinism: ratios on exact integer counts,
      // rounded once; the keep predicate compares UNROUNDED values
      // identically in both engines.
      val toks = Text.tokens(col("text"))
      val nw = size(toks).cast("long")
      val nonWs = length(regexp_replace(col("text"), "\\s", "")).cast("double")
      val nHash = (length(col("text")) - length(expr("replace(text, '#', '')"))).cast("double")
      val nEll = ((length(col("text")) - length(expr("replace(text, '...', '')"))).cast("double") / 3.0)
      val nAlpha = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double")
      val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      val stopHits = stops.map(w => array_contains(toks, w).cast("int")).reduce(_ + _)
      val meanLen = nonWs / nw
      val symRatio = (nHash + nEll) / nw
      val alphaRatio = nAlpha / nw
      tbl(s, dir, "documents").select(
        col("doc_id"), nw.as("n_words"),
        round(meanLen, 4).as("mean_word_len"),
        round(symRatio, 4).as("symbol_ratio"),
        round(alphaRatio, 4).as("alpha_ratio"),
        stopHits.as("stop_hits"),
        (nw.between(25, 100000) && meanLen.between(3.0, 10.0) &&
          symRatio <= 0.1 && alphaRatio >= 0.8 && stopHits >= 2).as("keep"))
    }),

    "q132_c4_filters" -> ((s, dir) => {
      // C4-style heuristic document filter (Raffel et al. 2020, §2.2):
      // drop docs containing code braces or boilerplate markers ("lorem
      // ipsum", "javascript"), require a minimum of terminal-punctuation
      // sentences and words. Same scan shape as q131: one projection
      // pass, zero shuffles; counts via length arithmetic (no regex in
      // the hot path).
      def cnt(ch: String) =
        (length(col("text")) - length(expr(s"replace(text, '$ch', '')"))).cast("long")
      val lowerT = lower(col("text"))
      val nw = size(Text.tokens(col("text"))).cast("long")
      val nTerm = cnt(".") + cnt("!") + cnt("?")
      val hasBrace = col("text").contains("{")
      val hasLorem = lowerT.contains("lorem ipsum")
      val hasJs = lowerT.contains("javascript")
      tbl(s, dir, "documents").select(
        col("doc_id"), nw.as("n_words"), nTerm.as("n_terminal"),
        hasBrace.as("has_brace"), hasLorem.as("has_lorem"), hasJs.as("has_javascript"),
        (!hasBrace && !hasLorem && nTerm >= 3 && nw >= 5).as("keep"))
    }),

    "q133_dsir_weights" -> ((s, dir) => {
      // DSIR importance weights (Xie et al. 2023): score every document by
      // the log-likelihood ratio of its tokens under a TARGET unigram LM
      // (here: the English slice) vs the RAW pool LM (the rest), add-one
      // smoothed over the shared vocabulary — the data-selection signal
      // used to upsample target-like documents. Scale shape: ONE corpus
      // scan feeds the pinned (doc, lang, pos, term) stream; both LMs and
      // the 1-row totals are vocab-/constant-sized partial aggs of it;
      // the per-term log-ratio table joins back BY TERM (broadcast while
      // the vocab fits). Determinism: per-term ratios on a 6-dp grid,
      // summed in position order via the q123 ordered fold.
      val pos = tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"), posexplode(Text.tokens(col("text"))))
        .select(col("doc_id"), col("lang"), col("pos"), col("col").as("term"))
        .localCheckpoint()
      val isT = col("lang") === "en"
      val tgt = pos.filter(isT).groupBy(col("term")).agg(count(lit(1)).as("tcnt"))
      val raw = pos.filter(!isT).groupBy(col("term")).agg(count(lit(1)).as("rcnt"))
      val totals = pos.agg(
        sum(isT.cast("long")).as("ttot"),
        sum((!isT).cast("long")).as("rtot"),
        countDistinct(col("term")).as("v"))
      val lt = pos.select(col("term")).distinct()
        .join(tgt, Seq("term"), "left").join(raw, Seq("term"), "left")
        .crossJoin(broadcast(totals))
        .select(col("term"), round(log(
          ((coalesce(col("tcnt"), lit(0L)) + 1).cast("double") / (col("ttot") + col("v"))) /
          ((coalesce(col("rcnt"), lit(0L)) + 1).cast("double") / (col("rtot") + col("v")))), 6).as("lt"))
      pos.join(lt, Seq("term"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          aggregate(array_sort(collect_list(struct(col("pos"), col("lt")))),
            lit(0.0), (a, x) => a + x.getField("lt")).as("lr"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("lr"), 4).as("log_ratio"), (col("lr") > 0).as("keep"))
    }),

    "q134_mix_temperature" -> ((s, dir) => {
      // Temperature-scaled source mixing (multilingual/T5-style α-sampling
      // with α = 0.5): per-source sampling weight ∝ √n_tokens, plus the
      // expected epochs over each source for a fixed token budget — the
      // mixing table a training run is configured from. Scale shape: one
      // scan-local (source, count) partial agg; everything after is
      // source-count-sized. Determinism: √n rounded to 6 dp per source
      // (sqrt is IEEE-exact in both engines), denominator summed in
      // source order via the ordered fold.
      val st = tbl(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(col("text"))).as("term"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_tokens"))
        .select(col("source"), col("n_tokens"),
          round(sqrt(col("n_tokens").cast("double")), 6).as("sw"))
        .localCheckpoint()
      val tot = st.agg(
        aggregate(array_sort(collect_list(struct(col("source"), col("sw")))),
          lit(0.0), (a, x) => a + x.getField("sw")).as("tot"))
      st.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens"),
          round(col("sw") / col("tot"), 6).as("weight"),
          round(col("sw") / col("tot") * lit(1000000.0) / col("n_tokens"), 4)
            .as("expected_epochs"))
    }),

    "q135_token_shards" -> ((s, dir) => {
      // Per-source token-budget sharding: contiguous doc runs (by id)
      // packed into ~2000-token training shards — the planning step that
      // turns a curated corpus into fixed-budget data files. The cumsum
      // window is partitioned BY SOURCE (never a global single-partition
      // window — the q119 lesson): each source's prefix sums shuffle and
      // sort independently, so the operator scales with the widest
      // source, not the corpus. All-integer arithmetic, no float drift.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          expr("cum_before div 2000").as("shard_id"),
          (col("cum_before") % 2000).as("shard_offset"))
    }),

    "q97_zorder_box" -> ((s, dir) => {
      // Z-order clustered layout + 2-D box probe: both user_id and value
      // stay locally clustered on the Morton curve, so the box touches a
      // minority of files on either dimension (LayoutSpec asserts the
      // skip; the oracle checks pruning never changes the answer).
      import graft.sources.Layout
      val path = s"target/zorder_demo/${new java.io.File(dir).getName}/events"
      // Cached-layout mode: the clustered write happens once per JVM;
      // bench rounds past the first time the PROBE (the recurring cost
      // of a real table), not the one-time write.
      Layout.prepareOnce(s"zorder-v1:$path") {
        Layout.writeZOrdered(
          Tables.events(s, dir).select(col("event_type"), col("user_id"), col("value")),
          path, "user_id", "value", nFiles = 16)
      }
      Layout.prunedReadBox(s, path, "user_id", 10L, 40L, "value", 20.0, 60.0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    "q93_manifest_scan" -> ((s, dir) => {
      // Manifest-pruned range scan: write events range-partitioned on
      // `value` with a per-file min/max sidecar, then answer the range
      // query reading ONLY overlapping files (LayoutSpec asserts the
      // file skip; here the oracle checks the answer is unchanged by
      // pruning — the Iceberg planner contract).
      import graft.sources.Layout
      val path = s"target/manifest_demo/${new java.io.File(dir).getName}/events"
      // Cached-layout mode (see q97): write once per JVM, bench the probe.
      Layout.prepareOnce(s"manifest-v1:$path") {
        Layout.writeWithManifest(
          Tables.events(s, dir).select(col("event_type"), col("user_id"), col("value")),
          path, "value", nFiles = 8)
      }
      Layout.prunedRead(s, path, "value", 10.0, 20.0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    "q107_decile_bins" -> ((s, dir) => {
      // Quantile feature binning the scale-clean way: exact decile
      // BOUNDARIES from one percentile aggregate (9 doubles to the
      // driver), bucket assignment as a codegen'd comparison sum on the
      // scan. A global ntile window would sort everything in ONE
      // partition; this is a scan + tiny agg at any size. DuckDB's
      // quantile_cont interpolates like Spark's percentile (q65).
      val orders = tbl(s, dir, "orders")
      val ps = (1 to 9).map(_ / 10.0)
      // ONE percentile aggregate with the whole percentage array: one
      // buffer + one sort (nine scalar percentile calls each buffer and
      // sort the column separately — 3.0 s vs 1.0 s at sf0.1).
      val bounds = orders.agg(
          percentile(col("o_totalprice"),
            array(ps.map(lit): _*)).as("bs"))
        .head().getSeq[Double](0)
      val decile = bounds.foldLeft(lit(1)) { (acc, b) =>
        acc + when(col("o_totalprice") > b, 1).otherwise(0)
      }
      orders.groupBy(decile.as("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
    }),

    "q106_transitions" -> ((s, dir) => {
      // Event-transition mining: per-user ordered stream -> (event,
      // next_event) bigram counts. One window (partition by user, order
      // by ts+id for a total order) + one groupBy — the Markov-chain
      // edge-weight table sessionization tools build.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
    }),

    "q104_funnel" -> ((s, dir) => {
      // Ordered-funnel analytics (view -> click -> purchase by first
      // occurrence): one groupBy computing the three conditional min
      // timestamps, then a pure CASE classification — single shuffle,
      // no self-joins (the naive form is three joins on user_id).
      val ev = Tables.events(s, dir)
      def firstTs(t: String) =
        min(when(col("event_type") === t, col("ts"))).as(s"first_$t")
      ev.groupBy(col("user_id"))
        .agg(firstTs("view"), firstTs("click"), firstTs("purchase"))
        .select(
          when(col("first_view").isNull, "no_view")
            .when(col("first_click").isNull ||
              col("first_click") <= col("first_view"), "view")
            .when(col("first_purchase").isNull ||
              col("first_purchase") <= col("first_click"), "view_click")
            .otherwise("view_click_purchase").as("stage"))
        .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
    }),

    "q105_cohorts" -> ((s, dir) => {
      // Cohort retention: users grouped by first-seen day, activity
      // counted per day offset. Two aggregations (first-seen, then
      // cohort cell counts) with a broadcast-joinable first-seen side.
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      ev.join(broadcast(cohort), Seq("user_id"))
        .select(col("user_id"), col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .filter(col("day_offset") <= 7)
        .groupBy(col("cohort_day").cast("string").as("cohort_day"),
          col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    }),

    "q103_time_travel" -> ((s, dir) => {
      // Snapshot commits + time travel + incremental feed: two appends,
      // then v1, v2, and the v1->v2 delta each aggregated — the delta
      // read touches ONLY batch-2's files (the change-feed contract;
      // SourcesSpec asserts the file sets).
      import graft.sources.Snapshots
      val path = s"target/snap_demo/${new java.io.File(dir).getName}/events"
      // Cached-layout mode (see q97): commit the two snapshots once per
      // JVM (reset first — stale dirs from older layout formats must
      // never leak into a fresh commit history), bench the three reads.
      graft.sources.Layout.prepareOnce(s"snap-v2:$path") {
        Snapshots.reset(path)
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"))
        Snapshots.append(ev.filter(col("event_id") % 2 === 0), path, "value", 4)
        Snapshots.append(ev.filter(col("event_id") % 2 === 1), path, "value", 4)
      }
      def agg(df: DataFrame, label: String) = df
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("total_value"))
        .select(lit(label).as("snapshot"), col("n"), col("total_value"))
      agg(Snapshots.readSnapshot(s, path, 1), "v1")
        .unionAll(agg(Snapshots.readSnapshot(s, path, 2), "v2"))
        .unionAll(agg(Snapshots.readIncrement(s, path, 1, 2), "delta"))
    }),

    "q102_bloom_point_scan" -> ((s, dir) => {
      // Per-file bloom manifest + point probes: equality lookups on a
      // key whose min/max spans every file (user_id) — range stats skip
      // nothing, blooms skip almost everything (LayoutSpec asserts the
      // file skip; the oracle checks the probes return full answers).
      import graft.sources.Layout
      val path = s"target/bloom_demo/${new java.io.File(dir).getName}/events"
      // Cached-layout mode (see q97): write once per JVM, bench the probes.
      Layout.prepareOnce(s"bloom-v1:$path") {
        Layout.writeWithBloomManifest(
          Tables.events(s, dir).select(col("event_type"), col("user_id"), col("value")),
          path, "user_id", nFiles = 16)
      }
      Seq(3L, 77L, 142L).map { k =>
        Layout.prunedPointRead(s, path, "user_id", k)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(dec)).cast("double").as("total_value"))
      }.reduce(_.unionAll(_))
    }),

    "q111_sliding_distinct" -> ((s, dir) => {
      // Trailing-3-day distinct users per (day, event_type): windows
      // cannot host COUNT(DISTINCT), so the idiom is per-day sets ->
      // sliding merge -> size(array_distinct(flatten(...))). Set sizes
      // are bounded by daily actives, so the window state stays small
      // even when the event count does not.
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(collect_set(col("user_id")).as("users"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("day")).rowsBetween(-2, 0)
      daily
        .withColumn("u3",
          size(array_distinct(flatten(collect_list(col("users")).over(w)))))
        .select(col("day").cast("string").as("day"), col("event_type"),
          size(col("users")).as("n_today"), col("u3").as("n_trailing_3d"))
    }),

    "q110_stratum_topk" -> ((s, dir) =>
      // Fixed-size per-stratum sample: exactly 20 docs per language by
      // smallest md5 unit-hash — guaranteed eval-set sizes, same
      // determinism contract as q76's rate-based form.
      graft.operators.Sampling.stratumTopK(
        tbl(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", k = 20)),

    "q101_quarantine" -> ((s, dir) => {
      // Row-level validation with a quarantine channel: one codegen'd
      // projection marks each row with the rules it broke; bad rows are
      // reported (never dropped silently, never fatal).
      val ev = Tables.events(s, dir)
      graft.operators.Validate.withViolations(ev, Seq(
          "extreme_value" -> (col("value") > 95.0),
          "suspect_user" -> (col("user_id") >= 140),
          "null_type" -> col("event_type").isNull))
        .filter(col("violations") =!= "")
        .select(col("event_id"), col("violations"))
    }),

    "q100_corpus_mix" -> ((s, dir) => {
      // Deterministic mix-to-target (static DoReMi shape): keep the
      // largest subset hitting 50/30/20 en/de/fr token proportions.
      // One tiny totals aggregate + one codegen'd hash filter.
      val docs = tbl(s, dir, "documents").select(col("doc_id"), col("lang"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.Sampling.mixToTarget(
          docs, "lang", "doc_id", "n_tokens",
          Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    }),

    "q99_sliding_chunks" -> ((s, dir) =>
      // Sliding-window chunking (embedding/RAG prep): 40-token windows,
      // 10-token overlap. Shuffle-free explode (see Sampling scaladoc).
      graft.operators.Sampling.slidingChunks(
        tbl(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", size = 40, overlap = 10)),

    "q98_inverted_index" -> ((s, dir) => {
      // Inverted-index build (the search-engine half of a curation
      // pipeline): token explode -> one groupBy term -> sorted, capped
      // posting lists as JSON. df is the full distinct-doc count even
      // where the posting list is capped, so rare-vs-common term stats
      // survive the cap; collect_set keeps per-term state bounded by
      // distinct docs, and the cap bounds the OUTPUT, which is what
      // explodes at corpus scale.
      tbl(s, dir, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"),
          sort_array(collect_set(col("doc_id"))).as("docs"))
        .filter(col("df") >= 50)
        .select(col("term"), col("df"),
          to_json(slice(col("docs"), 1, 20)).as("postings"))
    }),

    "q92_count_min" -> ((s, dir) => {
      // Count-min point queries: one vector-add-mergeable sketch over the
      // whole events stream (O(depth*width) state), then 10 key probes
      // against the one-row sketch (broadcast side). Width 64 << 150
      // distinct users forces real collisions, so cm_est >= true_cnt
      // with equality only where no key shares all 4 buckets — the
      // oracle replays the same LCG counters in SQL (q39 pattern).
      import graft.plans.SketchAggregates
      val events = tbl(s, dir, "events")
      // Partial sketches build per input partition; a single local file
      // would pin that to one task (q94 note), so spread first — the
      // merge is a vector add, indifferent to partitioning.
      val sk = events.repartition(s.sparkContext.defaultParallelism)
        .agg(SketchAggregates.countMin(col("user_id"), 64).as("sk"))
      val truth = events.groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
      s.range(0, 10).select(col("id").as("user_id"))
        .join(truth, Seq("user_id"), "left")
        .crossJoin(broadcast(sk))
        .select(col("user_id"), coalesce(col("true_cnt"), lit(0L)).as("true_cnt"),
          SketchAggregates.cmEstimate(col("sk"), col("user_id"), 64).as("cm_est"))
    }),

    "q60_langid_ngram" -> ((s, dir) =>
      tbl(s, dir, "documents").select(
        col("doc_id"), col("lang").as("actual_lang"),
        graft.plans.TextKernels.langIdNative(col("text"), ngramProfiles)
          .as("pred_lang"))),
    "q61_winnowing" -> ((s, dir) => {
      // Native kernel; fp referenced twice (size + hash), so compute it
      // once per reference — still ~250x cheaper than the HOF form.
      val fp = graft.plans.TextKernels.winnowingNative(col("text"), 5, 4)
      tbl(s, dir, "documents").select(
        col("doc_id"), size(fp).as("n_fp"),
        Text.md5Hex(concat_ws(",", fp)).as("fp_hash"))
    }),

    // ── Similarity search (beyond-parity, on embeddings) ────────────────
    "q38_embed_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
      e.select(col("vec_id"),
          round(Vectors.cosineToConst(col("embedding"), q), 4).as("cosine_sim"))
        .orderBy(col("cosine_sim").desc, col("vec_id"))
        .limit(10)
    }),
    "q39_lsh_ann" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
      val idx = Similarity.lshIndex(e, "vec_id", "embedding", nPlanes = 6, dim = q.size)
      Similarity.lshTopK(idx, "vec_id", "embedding", q, nPlanes = 6, k = 10)
        .withColumn("cosine_sim", round(col("cosine_sim"), 4))
    }),
    "q88_rerank" -> ((s, dir) => {
      // Two-stage retrieval: exact-cosine top-50 feeds the batched
      // cross-encoder stub (mapPartitions, per-partition model init),
      // top-10 by the blended score. The stub's md5 affinity makes the
      // reranked scores exactly oracle-checkable.
      import s.implicits._
      val e = tbl(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
      val cands = e.select(col("vec_id").as("id"),
          Vectors.cosineToConst(col("embedding"), q).as("stage1_score"))
        .orderBy(col("stage1_score").desc, col("id")).limit(50)
        .as[graft.operators.Rerank.Candidate]
      graft.operators.Rerank.rerank(cands, queryId = 0L, batchSize = 16)
        .orderBy(col("rerank_score").desc, col("id")).limit(10)
        .select(col("id").as("vec_id"),
          round(col("stage1_score"), 4).as("cosine_sim"),
          round(col("rerank_score"), 4).as("rerank_score"))
    }),
    "q84_int8_ann" -> ((s, dir) => {
      // Scalar-quantized (int8) ANN: the persisted index is 4x smaller
      // than fp32, scoring is an exact integer dot de-scaled by two
      // per-vector scales — both cross-engine exact, so the oracle checks
      // the quantized scores themselves, not just the id set.
      val e = tbl(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toSeq
      Similarity.int8TopK(e, "vec_id", "embedding", q, 10)
    }),
    "q40_near_pairs_demo" -> ((s, dir) => {
      // DEMO, NOT A SCALE PATH (hence the _demo suffix): deliberately
      // bounded (300 vectors) brute-force all-pairs contrast for the
      // bucketed plan in q66 — an inequality join is a nested-loop O(n²)
      // product. Kept oracle-checked but excluded from the bench.
      // Norms precomputed per row (linear) so each of the O(n^2) candidate
      // pairs costs a single codegen'd dot product.
      val e = tbl(s, dir, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"), Vectors.toDoubleVec(col("embedding")).as("v"))
        .withColumn("nrm", Vectors.l2Norm(col("v")))
      val a = e.select(col("vec_id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
      val b = e.select(col("vec_id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Vectors.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 4)
            .as("cosine_sim"))
        .filter(col("cosine_sim") >= 0.35)
    }),
    "q66_bucketed_near_pairs" -> ((s, dir) => {
      // The SCALE-SAFE near-dup path (vs q40's bounded brute-force demo):
      // hyperplane-LSH buckets → bucket-local self-join. Candidate pairs
      // are O(sum of bucket² sizes), never all-pairs.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      Similarity.nearDuplicatePairs(e, "vec_id", "embedding",
          nPlanes = 4, dim = dim, threshold = 0.3)
        .withColumn("cosine_sim", round(col("cosine_sim"), 4))
    }),
    "q109_jaccard_join" -> ((s, dir) =>
      // EXACT set-similarity self-join (PPJoin prefix filter + verify)
      // at J >= 4/5 over 3-gram shingle SETS (word sets are degenerate
      // in this corpus — tiny shared vocabulary makes nearly all pairs
      // similar; shingles discriminate). The oracle is the BRUTE-FORCE
      // all-pairs Jaccard — matching it proves the prefix filter
      // dropped no qualifying pair.
      graft.operators.Dedup.jaccardJoin(
        tbl(s, dir, "documents")
          // Spread BEFORE the shingle projection so it computes in
          // parallel (the projection runs below any later exchange).
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"),
            graft.plans.TextKernels.wordShinglesNative(col("text"), 3).as("toks")),
        "doc_id", "toks", tNum = 4, tDen = 5)),

    "q108_triangles" -> ((s, dir) => {
      // Triangle enumeration over the near-dup graph (clusters of three
      // mutually-similar vectors). Edges are already oriented low->high
      // id, which IS the classic node-iterator degree/order trick: every
      // triangle a<b<c is found exactly once, and wedge fan-out at a hub
      // is bounded by its higher-id neighbors only — the skew control
      // that keeps triangle counting alive on power-law graphs.
      val e = tbl(s, dir, "embeddings")
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val pairs = Similarity.nearDuplicatePairs(e, "vec_id", "embedding",
          nPlanes = 4, dim = dim, threshold = 0.3)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint() // referenced three times (q78 rule)
      val wedges = pairs
        .join(pairs.select(col("id_a").as("id_b"), col("id_b").as("id_c")), "id_b")
      wedges
        .join(pairs.select(col("id_a"), col("id_b").as("id_c")),
          Seq("id_a", "id_c"), "left_semi")
        .select(col("id_a").as("a"), col("id_b").as("b"), col("id_c").as("c"))
    }),

    "q67_ivf_search" -> ((s, dir) => {
      // IVF-Flat with deterministic centroids (first 16 vectors): assign
      // every vector to its nearest centroid cell (codegen'd dot products
      // + struct-least argmin), probe the 2 cells nearest the query, exact
      // cosine top-k inside them. Persist `indexed` partitionBy("cell")
      // for partition-pruned search at scale (IvfSpec asserts pruning).
      val e = tbl(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") < 16).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
      val model = operators.Ivf.buildWithCentroids(e, "vec_id", "embedding", cents)
      operators.Ivf.searchDetailed(model, "vec_id", "embedding", cents.head,
          nProbe = 2, topK = 10)
        .withColumn("cosine_sim", round(col("cosine_sim"), 4))
    }),
    "q82_pq_adc" -> ((s, dir) => {
      // Product quantization: 64-dim floats → 8 codes (deterministic
      // rank-order codebooks), ADC shortlist of 50 via an m×k lookup
      // table, exact cosine rerank to top-10. The compressed-domain
      // scan never touches the float vectors.
      val e = tbl(s, dir, "embeddings")
      val sample = e.filter(col("vec_id") < 16).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
      val cbs = operators.Pq.codebooksFromSample(sample, 8)
      val model = operators.Pq.encode(e, "embedding", cbs)
      operators.Pq.search(model, "vec_id", "embedding", sample.head,
          rerank = 50, topK = 10)
        .withColumn("cosine_sim", round(col("cosine_sim"), 4))
    }),
    "q41_label_stats" -> ((s, dir) =>
      tbl(s, dir, "embeddings")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), min(size(col("embedding"))).as("min_dim"),
          max(size(col("embedding"))).as("max_dim"))),

    // ── Composite-key join + join-back agg (SURVEY J3/J10) ──────────────
    "q27_composite_join" -> ((s, dir) => {
      // Row-preserving aggregate-join-back done as a WINDOW (SURVEY J10
      // note): one shuffle by the composite key instead of groupBy +
      // join-back (two). Same result, verified against the join-form
      // oracle.
      val w = Window.partitionBy(col("l_partkey"), col("l_suppkey"))
      tbl(s, dir, "lineitem")
        .withColumn("avg_qty",
          sum(col("l_quantity").cast(dec)).over(w).cast("double") / count(lit(1)).over(w))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(
          sum(when(col("l_quantity") > col("avg_qty"), 1).otherwise(0)).as("n_above"),
          count(lit(1)).as("n_total"))
    }),

    // ── JSON-array-string aggregation (SURVEY A2 concat-built JSON) ─────
    "q43_json_build" -> ((s, dir) => {
      val perStatus = tbl(s, dir, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .withColumn("obj",
          concat(lit("{\"status\":\""), col("o_orderstatus"), lit("\",\"n\":"),
            col("n").cast("string"), lit("}")))
      perStatus
        .groupBy(col("o_orderpriority"))
        .agg(concat(lit("["),
          concat_ws(",", sort_array(collect_list(col("obj")))), lit("]"))
          .as("status_json"))
    }),

    // ── max(when(contains)) existence flag per group (SURVEY A5) ────────
    "q45_any_flag" -> ((s, dir) => {
      val flags = tbl(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
      val p = tbl(s, dir, "part")
      p.join(flags, p("p_partkey") === flags("l_partkey"), "left")
        .groupBy(col("p_brand"))
        .agg(sum(coalesce(col("has_r"), lit(0))).as("n_parts_with_returns"),
          count(lit(1)).as("n_parts"))
    }),

    // ── array_distinct(flatten(collect_list)) (SURVEY A3) ───────────────
    "q46_flatten_distinct" -> ((s, dir) => {
      // Single shuffle by design: partial collect_set dedups map-side, so
      // the exchange already carries per-partition-distinct flags. A
      // pre-`distinct()` on (orderkey, flag) was A/B-measured at sf0.1 and
      // LOST (~1.1s vs ~1.0s): it shuffles the same deduped bytes but adds
      // a second exchange ((okey,flag)-hash → okey-hash).
      val perOrder = tbl(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_returnflag")).as("flags"))
      val o = tbl(s, dir, "orders")
      o.join(perOrder, o("o_orderkey") === perOrder("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(array_join(
          sort_array(array_distinct(flatten(collect_list(col("flags"))))), ",")
          .as("all_flags"))
    }),

    // ── collect_list over ordered window, then max per group (W1/A8) ────
    "q47_window_list" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 3)
        .withColumn("ship_seq",
          concat_ws(",",
            collect_list(date_format(col("l_shipdate"), "yyyy-MM-dd")).over(w)))
        .groupBy(col("l_suppkey"))
        .agg(max(col("ship_seq")).as("ship_dates"))
    }),

    // ── Beyond parity: rollup / intersect / except / date parts ─────────
    "q65_median" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          count(lit(1)).as("n"))
    }),
    "q63_cube" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"))
    }),
    "q64_analytics" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      tbl(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_price"))
    }),
    "q48_rollup" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"))
    }),
    "q49_intersect" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")).distinct()
        .intersect(
          o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey")).distinct())
    }),
    "q50_except" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")).distinct()
        .except(
          o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey")).distinct())
    }),
    "q51_date_parts" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"))
    }),

    // ── Column-expression scoring (SURVEY A6/A7, no UDF/RDD) ────────────
    "q52_score" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
        .select(
          col("c_custkey"),
          (when(col("c_acctbal") > 5000, 40).when(col("c_acctbal") > 1000, 20).otherwise(0)
            + when(col("c_mktsegment") === "BUILDING", 10).otherwise(0)
            + floor(least(col("n_orders"), lit(7L)) * 100 / 7.0).cast("int"))
            .as("metadata_score"))
    }),

    // ── Property-graph node/edge tables (reference nodes/edges jobs) ────
    "q53_nodes" -> ((s, dir) => {
      val c = tbl(s, dir, "customer").select(
        lit("customer").as("node_type"), col("c_custkey").as("node_id"),
        concat(lit("{\"name\":\""), col("c_name"), lit("\"}")).as("data"))
      val sp = tbl(s, dir, "supplier").select(
        lit("supplier").as("node_type"), col("s_suppkey").as("node_id"),
        concat(lit("{\"name\":\""), col("s_name"), lit("\"}")).as("data"))
      c.union(sp)
    }),
    // ── As-of join (time-series operator composed Spark-first) ──────────
    "q57_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("view_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      Relational.asofJoin(purchases, views, "user_id", "ts", "view_id", "last_view_id")
        .select(col("purchase_id"), col("user_id"), col("last_view_id"))
    }),

    // ── Banded range join (inequality join without the cross product) ───
    "q58_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Relational.bandedRangeJoin(errors, purchases, "user_id", "ts", 300)
        .select(col("l_event_id").as("error_id"), col("r_event_id").as("purchase_id"))
    }),

    // ── Sketches (HLL distinct, approximate quantiles; no exact oracle) ─
    "q59_sketches" -> ((s, dir) => {
      // HLL + t-digest sketches, emitted as an EXACTLY-checkable
      // validation contract: raw sketch values differ engine-to-engine,
      // so the output is the exact statistic plus error-bound flags the
      // oracle asserts as TRUE (HLL default rsd 5% — checked at 3σ;
      // percentile_approx rank error ≪ 1% at accuracy 1000). A sketch
      // drifting out of tolerance flips a flag and fails the hash.
      // Plan shape: countDistinct goes in its OWN aggregation — mixing a
      // distinct agg (expand rewrite) with TypedImperative percentiles in
      // one groupBy degrades the whole aggregate to a sort-based path
      // over the expanded rows (measured 3.2s vs 0.6s split at sf0.1).
      // The rejoin is a broadcast on the handful of group rows.
      // Exact distinct via two-level aggregate, not countDistinct: the
      // distinct-agg rewrite Expands every row; (flag, key) dedup
      // partial-aggregates map-side, then the count per flag is tiny.
      val li = tbl(s, dir, "lineitem")
      val exactD = li.select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_parts"))
      val sketches = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("p50_approx"),
          expr("percentile(l_extendedprice, 0.5)").as("p50_exact"))
      exactD.join(broadcast(sketches), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.15).as("approx_parts_ok"),
          (abs(col("p50_approx") - col("p50_exact")) <=
            abs(col("p50_exact")) * 0.01).as("p50_ok"))
    }),

    // ── Benchmark decontamination: train/eval n-gram overlap ────────────
    "q78_contamination" -> ((s, dir) => {
      // Distinct 3-gram shingles per doc, eval (doc_id < 50) joined to
      // train on the shingle key — the standard pretraining-vs-benchmark
      // overlap check. Candidate generation is an equi-join on shingles
      // (partition by shingle hash), never a doc×doc product.
      // The plan references the shingle table three times (eval side,
      // train side, df cap). Materialize it ONCE — repartition for
      // explode parallelism (single local file = one task otherwise),
      // localCheckpoint to pin the result (the Closure.scala pattern).
      // Probe-measured at sf0.1: recompute-per-reference 5.1 s,
      // materialized 2.2 s; at 100 TB recomputing the corpus shingle
      // scan three times is the difference between one pass and three.
      val sh = tbl(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          explode(array_distinct(
            graft.plans.TextKernels.wordShinglesNative(col("text"), 3))).as("shingle"))
        .localCheckpoint()
      val ev = sh.filter(col("doc_id") < 50)
        .select(col("doc_id").as("eval_id"), col("shingle"))
      val tr = sh.filter(col("doc_id") >= 50)
        .select(col("doc_id").as("train_id"), col("shingle"))
      // Doc-frequency cap: a shingle present in >64 train docs is corpus
      // boilerplate, not contamination signal — and at 100 TB it is the
      // skew killer (one hot trigram funnels every doc through one
      // reducer and inflates candidates quadratically). One bounded
      // groupBy caps the join's per-key fan-out at 64.
      val rare = tr.groupBy(col("shingle"))
        .agg(countDistinct(col("train_id")).as("df"))
        .filter(col("df") <= 64).select(col("shingle"))
      ev.join(tr, Seq("shingle"))
        .join(rare, Seq("shingle"), "left_semi")
        .groupBy(col("eval_id"))
        .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
          countDistinct(col("train_id")).as("n_contaminating_docs"))
    }),

    // ── Corpus shaping: deterministic sampling + sequence packing ───────
    "q76_stratified_sample" -> ((s, dir) =>
      graft.operators.Sampling.stratifiedSample(
        tbl(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", Map("en" -> 0.5), defaultRate = 0.2)),
    "q77_sequence_packing" -> ((s, dir) =>
      graft.operators.Sampling.chunkAssignments(
        tbl(s, dir, "documents").select(col("doc_id"), col("lang"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens")),
        "lang", "doc_id", "n_tokens", budget = 2048)),

    // ── KMV sketch: cross-engine EXACT distinct estimate (vs q59 HLL) ───
    "q75_kmv_sketch" -> ((s, dir) => {
      // Native TypedImperativeAggregate (primitive-buffer, no per-row
      // encoder round-trip); the typed-Aggregator form lives on in
      // AggregatorsSpec as the extension-point demo.
      val hv = (conv(substring(md5(col("l_partkey").cast("string").cast("binary")), 1, 8),
        16, 10).cast("long").cast("double") / 4294967296.0).as("hv")
      tbl(s, dir, "lineitem").select(col("l_returnflag"), hv)
        .groupBy(col("l_returnflag"))
        .agg(graft.plans.SketchAggregates.kmvDistinct(col("hv"), 64)
          .as("distinct_est"))
    }),

    // ── SQL surface (pdcm_api-style views, §3.3) ────────────────────────
    "q55_sql_view" -> ((s, dir) => {
      graft.api.SqlViews.register(s, dir)
      s.sql(
        """SELECT region_name, c_mktsegment AS segment, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM order_facts WHERE o_orderstatus = 'F'
           GROUP BY region_name, segment""")
    }),
    "q56_doc_stats_view" -> ((s, dir) => {
      graft.api.SqlViews.register(s, dir)
      s.sql(
        """SELECT lang, count(*) AS n_docs, sum(n_tokens) AS total_tokens
           FROM document_stats GROUP BY lang""")
    }),
    "q69_facet_view" -> ((s, dir) => {
      graft.api.SqlViews.register(s, dir)
      s.sql(
        """SELECT facet_name, array_join(options, ',') AS options,
           CAST(size(options) AS BIGINT) AS n_options
           FROM facet_options""")
    }),
    "q70_display_view" -> ((s, dir) => {
      graft.api.SqlViews.register(s, dir)
      s.sql(
        """SELECT l_orderkey, l_linenumber, p_name, supplier_name,
           brand_display, l_quantity
           FROM item_display WHERE brand_display LIKE 'Brand#3%'""")
    }),
    "q79_overview_view" -> ((s, dir) => {
      // models_by_* overview shape (views.sql:1418 family) served from
      // the registered SQL surface.
      graft.api.SqlViews.register(s, dir)
      s.sql("SELECT nation_name, n_orders FROM orders_by_nation")
    }),
    "q80_facet_options_view" -> ((s, dir) => {
      // search_facet_options shape (views.sql:1280): explode the facet
      // option arrays into one row per option.
      graft.api.SqlViews.register(s, dir)
      s.sql("SELECT facet_name, option FROM facet_option_rows")
    }),
    "q115_data_overview_cohorts" -> ((s, dir) => {
      // data_overview_*_cohorts (data_visualization_views.sql:7,46) —
      // the cohort views the reference disables on its cluster for
      // cost. As a folded-view query the panel filter reaches the part
      // scan and the dims broadcast; the per-row log2 is codegen'd.
      graft.api.SqlViews.register(s, dir)
      s.sql("""SELECT l_orderkey, l_linenumber, symbol, provider, type,
               cohort_system, l_quantity, price_log
               FROM item_cohorts""")
    }),
    "q62_sql_kernels" -> ((s, dir) => {
      // Custom Catalyst kernels exposed as SQL functions via
      // GraftFunctions/GraftExtensions; same oracle as the DataFrame form.
      graft.plans.GraftFunctions.register(s)
      graft.api.SqlViews.register(s, dir)
      s.sql("SELECT doc_id, graft_simhash16(text) AS simhash FROM documents")
    }),

    // ── Distributed transitive closure (graph.Closure, semi-naive) ──────
    "q68_ancestor_closure" -> ((s, dir) => {
      // Synthetic 11-deep binary tree over part ids (child k → parent
      // k div 2); the closure operator itself is the ontology/lineage
      // ancestor-closure path for fact-sized graphs.
      val edges = tbl(s, dir, "part")
        .filter(col("p_partkey") > 1)
        .select(col("p_partkey").as("child"),
          expr("p_partkey div 2").as("parent"))
      graft.graph.Closure.transitiveClosure(edges, "child", "parent")
    }),

    "q54_edges" -> ((s, dir) => {
      // Dedup per branch, not after the union: 'placed' is already unique
      // (one row per order) and cross-branch duplicates are impossible
      // (distinct labels), so only the 'contains' branch shuffles — and
      // the union itself is shuffle-free.
      val placed = tbl(s, dir, "orders").select(
        lit("placed").as("label"), col("o_custkey").as("src"),
        col("o_orderkey").as("dst"))
      val contains = tbl(s, dir, "lineitem").select(
        lit("contains").as("label"), col("l_orderkey").as("src"),
        col("l_partkey").as("dst")).dropDuplicates()
      placed.union(contains)
    }),

    "q112_parents_tree" -> ((s, dir) => {
      // Nested PARENTS tree per model (reference get_parents_tree,
      // init.sql:1175-1188) over an 11-deep single-parent hierarchy
      // (child k -> parent k div 2). The operator resolves one tree
      // LEVEL per round for ALL models at once (rounds = depth, work =
      // O(models x depth)) — vs the reference's one recursive Postgres
      // call per model. The oracle walks each ancestor chain with a
      // recursive CTE and builds the byte-identical nested JSON.
      val m = tbl(s, dir, "part").filter(col("p_partkey") < 2048)
        .select(concat(lit("M"), col("p_partkey")).as("external_model_id"),
          when(col("p_partkey") % 2 === 0, "PDX").otherwise("organoid").as("type"),
          when(col("p_partkey") > 1,
            concat(lit("M"), expr("p_partkey div 2"))).as("parent_id"))
      graft.graph.Trees.parentsTree(m, "external_model_id", "type", "parent_id")
    }),

    "q113_model_relationships" -> ((s, dir) => {
      // model_relationships + has_relations (reference updates.sql:1-39):
      // {"parents":...,"children":...} per model over a 3-level family
      // hierarchy (root, 3 mid models, leaf models) derived from part.
      // Children trees resolve bottom-up (a parent resolves once ALL its
      // children have), parents trees top-down — both sweeps touch every
      // model once per level.
      val o = col("p_partkey") % 16
      val m = tbl(s, dir, "part").select(
        concat(lit("M"), col("p_partkey")).as("external_model_id"),
        when(col("p_partkey") % 3 === 0, "PDX")
          .when(col("p_partkey") % 3 === 1, "organoid")
          .otherwise("cell line").as("type"),
        when(o === 0, lit(null).cast("string"))
          .when(o <= 3, concat(lit("M"), col("p_partkey") - o))
          .otherwise(concat(lit("M"),
            col("p_partkey") - o + 1 + ((o - 4) % 3))).as("parent_id"))
      graft.graph.Trees.modelRelationships(m, "external_model_id", "type", "parent_id")
    }),

    "q116_bucketed_join" -> ((s, dir) => {
      // Bucket-bucket co-located join: both sides bucketed 16 ways on
      // the join key at WRITE time, so the join runs with NO exchange
      // on either side — the shuffle happened once and is amortized
      // over every subsequent join (LayoutSpec asserts the only
      // Exchange left is the final group-by). This is the layout move
      // that turns a 100 TB fact-fact join from the cluster's biggest
      // shuffle into a partition-local merge.
      import graft.sources.Layout
      val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val oT = s"graft_orders_bkt_$tag"
      val lT = s"graft_lineitem_bkt_$tag"
      Layout.prepareOnce(s"bucketed-v1:$dir") {
        Layout.writeBucketed(
          tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          s, oT, "o_orderkey", nBuckets = 16)
        Layout.writeBucketed(
          tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity")),
          s, lT, "l_orderkey", nBuckets = 16)
      }
      s.table(lT).join(s.table(oT), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(dec)).cast("double").as("total_qty"))
    }),

    "q117_partitioned_scan" -> ((s, dir) => {
      // Hive-layout directory partitioning on the coarse filter key:
      // the event_type predicate becomes a PartitionFilter, so
      // non-matching directories contribute ZERO I/O (LayoutSpec
      // asserts the filter reaches the partition level) — the
      // partition-pruning tier the reference's flat per-entity dirs
      // never get (SURVEY §4).
      import graft.sources.Layout
      val path = s"target/part_demo/${new java.io.File(dir).getName}/events"
      Layout.prepareOnce(s"partitioned-v1:$path") {
        Layout.writePartitioned(
          Tables.events(s, dir).select(col("event_type"), col("user_id"), col("value")),
          path, Seq("event_type"))
      }
      s.read.parquet(path)
        .filter(col("event_type").isin("purchase", "error"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
    }),

    "q114_knowledge_graph" -> ((s, dir) => {
      // Knowledge-graph JSON per root (reference get_knowledge_graph,
      // updates.sql:81-150): reachable subgraph from each root over a
      // namespaced customer->order->part->supplier edge table, emitted
      // as one {"nodes":[...],"edges":[...]} row per root. All roots
      // expand in the SAME frontier iteration — per-model recursive
      // calls never scale; a multi-source BFS join does.
      val oOff = 10000000L; val pOff = 20000000L; val sOff = 30000000L
      val orders = tbl(s, dir, "orders")
      val li = tbl(s, dir, "lineitem")
      val edges = orders.select(col("o_custkey").as("src"),
          (col("o_orderkey") + oOff).as("dst"), lit("placed").as("label"))
        .union(li.select((col("l_orderkey") + oOff).as("src"),
          (col("l_partkey") + pOff).as("dst"), lit("contains").as("label"))
          .dropDuplicates())
        .union(li.select((col("l_partkey") + pOff).as("src"),
          (col("l_suppkey") + sOff).as("dst"), lit("supplied_by").as("label"))
          .dropDuplicates())
      val nodes = tbl(s, dir, "customer").select(col("c_custkey").as("node_id"),
          lit("customer").as("node_type"),
          concat(lit("{\"name\":\""), col("c_name"), lit("\"}")).as("data"))
        .union(orders.select((col("o_orderkey") + oOff).as("node_id"),
          lit("order").as("node_type"),
          concat(lit("{\"status\":\""), col("o_orderstatus"), lit("\"}")).as("data")))
        .union(tbl(s, dir, "part").select((col("p_partkey") + pOff).as("node_id"),
          lit("part").as("node_type"),
          concat(lit("{\"name\":\""), col("p_name"), lit("\"}")).as("data")))
        .union(tbl(s, dir, "supplier").select((col("s_suppkey") + sOff).as("node_id"),
          lit("supplier").as("node_type"),
          concat(lit("{\"name\":\""), col("s_name"), lit("\"}")).as("data")))
      val roots = tbl(s, dir, "customer")
        .filter(col("c_custkey").isin(1L, 7L, 42L))
        .select(col("c_custkey").as("root"))
      graft.graph.Trees.knowledgeGraph(nodes, edges, roots, "root")
    })
  )

  private val ngramProfiles: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "sch", "ein", "ich"),
    "en" -> Seq("the", " th", "he ", "ing", "and"),
    "es" -> Seq("de ", "la ", "os ", "ion"),
    "fr" -> Seq("le ", "es ", "ent", "eau"),
    "zh" -> Seq("的", "是", "了")
  )

  private val langMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und"),
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"),
    "zh" -> Seq("的", "是", "了", "在")
  )

  // ───────────────────────── Oracle SQL ─────────────────────────────────

  private val tokSql = "regexp_split_to_array(trim(text), '\\s+')"

  /** q161 oracle: the identical fixed power iteration the Scala driver
    * runs, unrolled as SQL — Gram via the flat self-join, x₀ = 1/√d, then
    * `iters` rounds of normalize(G·x) as chained CTEs. Both sides do the
    * same IEEE operations on the same full-precision Gram, so 4-dp
    * loadings agree.
    */
  private def pcaPowerSql(d: Int, iters: Int): String = {
    // MATERIALIZED: without it DuckDB inlines every CTE reference, so
    // each of the `iters` steps re-expands the corpus self-join — the
    // plan (and its file-handle count) explodes combinatorially.
    val steps = (1 to iters).map { k =>
      s"""y$k AS MATERIALIZED (SELECT f.i, sum(f.g * x.v) AS y
           FROM gfull f JOIN x${k - 1} x ON f.j = x.i GROUP BY f.i),
         x$k AS MATERIALIZED (
           SELECT i, y / (SELECT sqrt(sum(y*y)) FROM y$k) AS v FROM y$k)"""
    }.mkString(",\n         ")
    s"""WITH flat AS MATERIALIZED (
           SELECT vec_id, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i)),
         gu AS MATERIALIZED (
           SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS g
           FROM flat a JOIN flat b USING (vec_id) WHERE a.i <= b.i
           GROUP BY 1, 2),
         gfull AS MATERIALIZED (
           SELECT i, j, g FROM gu
           UNION ALL SELECT j, i, g FROM gu WHERE i <> j),
         x0 AS (SELECT DISTINCT i, 1.0 / sqrt(${d}.0) AS v FROM gfull),
         $steps
         SELECT xf.i AS component, round(xf.v, 4) AS loading,
           round((SELECT sum(f.g * a.v * b.v)
                  FROM gfull f JOIN x$iters a ON f.i = a.i
                  JOIN x$iters b ON f.j = b.i), 3) AS eigenvalue
         FROM x$iters xf"""
  }

  /** Unrolled damped PageRank over the supplier co-purchase graph —
    * same MATERIALIZED discipline as [[pcaPowerSql]] (DuckDB inlines
    * non-materialized CTEs, re-expanding the edge build per iteration).
    * Constants are CAST AS DOUBLE so DuckDB's decimal literals don't
    * shift the math off Spark's IEEE doubles (1.0-0.85 differs from a
    * literal 0.15 by one ulp in binary64).
    */
  private def pageRankSql(iters: Int): String = {
    val d = "CAST(0.85 AS DOUBLE)"
    val one = "CAST(1.0 AS DOUBLE)"
    val steps = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (
           SELECT n.node, ($one - $d) / (SELECT n FROM nn)
               + $d * coalesce(c.s, CAST(0.0 AS DOUBLE)) AS pr
           FROM nodes n LEFT JOIN (
             SELECT e.dst AS node, sum(r.pr * e.w) AS s
             FROM ew e JOIN r${k - 1} r ON e.src = r.node
             GROUP BY e.dst) c USING (node))"""
    }.mkString(",\n         ")
    s"""WITH li AS MATERIALIZED (SELECT l_orderkey, l_suppkey FROM lineitem),
         edges AS MATERIALIZED (
           SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey <> b.l_suppkey),
         deg AS MATERIALIZED (
           SELECT src, count(*) AS deg FROM edges GROUP BY src),
         ew AS MATERIALIZED (
           SELECT e.src, e.dst, $one / CAST(d.deg AS DOUBLE) AS w
           FROM edges e JOIN deg d USING (src)),
         nodes AS MATERIALIZED (SELECT DISTINCT s_suppkey AS node FROM supplier),
         nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         r0 AS MATERIALIZED (
           SELECT node, $one / (SELECT n FROM nn) AS pr FROM nodes),
         $steps
         SELECT node AS s_suppkey, round(pr, 8) AS pagerank FROM r$iters"""
  }

  /** Unrolled bounded-hop Bellman–Ford over the weighted (1/shared-
    * orders) co-purchase graph — same MATERIALIZED/unroll discipline as
    * [[pageRankSql]]; all relaxations replay the engine's doubles
    * exactly because both sides build candidate costs with the same
    * `dist + w` recursion over the same 6-dp weight grid.
    */
  private def ssspSql(rounds: Int): String = {
    val steps = (1 to rounds).map { k =>
      s"""d$k AS MATERIALIZED (
           SELECT node, min(cand) AS dist FROM (
             SELECT node, dist AS cand FROM d${k - 1}
             UNION ALL
             SELECT e.sb AS node, r.dist + e.w AS cand
             FROM und e JOIN d${k - 1} r ON e.sa = r.node)
           GROUP BY node)"""
    }.mkString(",\n         ")
    s"""WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_suppkey AS sa, b.l_suppkey AS sb,
             round(CAST(1.0 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS w
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2 HAVING count(*) >= 5),
         und AS MATERIALIZED (
           SELECT sa, sb, w FROM e UNION ALL SELECT sb, sa, w FROM e),
         d0 AS (SELECT s_suppkey AS node, CAST(0.0 AS DOUBLE) AS dist
           FROM supplier WHERE s_suppkey <= 3),
         $steps
         SELECT node AS s_suppkey, round(dist, 6) AS dist FROM d$rounds"""
  }

  /** Unrolled deterministic label propagation over the same supplier
    * co-purchase graph as [[pageRankSql]] — integer-only math, so every
    * sweep replays exactly. Argmax-with-min-tie-break is the two-step
    * max-count / min-label form (≡ the engine's min(struct(-cnt, label))).
    */
  private def labelPropagationSql(rounds: Int): String = {
    val steps = (1 to rounds).map { k =>
      s"""cnt$k AS MATERIALIZED (
           SELECT e.dst AS node, r.label, CAST(count(*) AS BIGINT) AS c
           FROM edges e JOIN l${k - 1} r ON e.src = r.node GROUP BY 1, 2),
         mx$k AS (SELECT node, max(c) AS mc FROM cnt$k GROUP BY node),
         pick$k AS (SELECT c.node, min(c.label) AS nbr
           FROM cnt$k c JOIN mx$k m ON c.node = m.node AND c.c = m.mc
           GROUP BY 1),
         l$k AS MATERIALIZED (
           SELECT p.node, coalesce(k.nbr, p.label) AS label
           FROM l${k - 1} p LEFT JOIN pick$k k USING (node))"""
    }.mkString(",\n         ")
    s"""WITH li AS MATERIALIZED (SELECT l_orderkey, l_suppkey FROM lineitem),
         edges AS MATERIALIZED (
           SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey <> b.l_suppkey),
         l0 AS MATERIALIZED (
           SELECT DISTINCT s_suppkey AS node, s_suppkey AS label FROM supplier),
         $steps
         SELECT node AS s_suppkey, label AS community FROM l$rounds"""
  }

  private def vocabHitsSql(words: Seq[String]): String =
    s"len(list_filter(w, t -> list_contains([${words.map("'" + _ + "'").mkString(",")}], t)))"

  private val langIdSql: String = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    val hitCols = langs.map { case (l, ws) => s"${vocabHitsSql(ws)} AS ${l}_hits" }
    val mx = s"greatest(${langs.map(_._1 + "_hits").mkString(", ")})"
    val caseChain = langs.map { case (l, _) => s"WHEN ${l}_hits = $mx THEN '$l'" }
      .mkString("CASE ", " ", " END")
    s"""SELECT doc_id, actual_lang, $caseChain AS pred_lang FROM (
       SELECT doc_id, lang AS actual_lang, ${hitCols.mkString(", ")} FROM (
         SELECT doc_id, lang, $tokSql AS w FROM documents))"""
  }

  private val ngramLangSql: String = {
    val langs = ngramProfiles.toSeq.sortBy(_._1)
    val hitCols = langs.map { case (l, ps) =>
      val listLit = ps.map(p => "'" + p + "'").mkString(",")
      s"len(list_filter(grams, g -> list_contains([$listLit], g))) AS ${l}_hits"
    }
    val mx = s"greatest(${langs.map(_._1 + "_hits").mkString(", ")})"
    val caseChain = langs.map { case (l, _) => s"WHEN ${l}_hits = $mx THEN '$l'" }
      .mkString("CASE ", " ", " END")
    s"""SELECT doc_id, actual_lang, $caseChain AS pred_lang FROM (
       SELECT doc_id, actual_lang, ${hitCols.mkString(", ")} FROM (
         SELECT doc_id, lang AS actual_lang,
           CASE WHEN length(t) >= 3
             THEN list_transform(range(1, length(t)-1), i -> substr(t, i, 3))
             ELSE [] END AS grams
         FROM (SELECT doc_id, lang, lower(text) AS t FROM documents)))"""
  }

  private val winnowingSql: String =
    """WITH h AS (SELECT doc_id,
         list_transform(
           CASE WHEN length(t) >= 5
             THEN list_transform(range(1, length(t)-3), i -> substr(t, i, 5))
             ELSE [] END,
           g -> md5(g)) AS hs
         FROM (SELECT doc_id, lower(text) AS t FROM documents)),
       f AS (SELECT doc_id,
         CASE WHEN len(hs) >= 4
           THEN list_sort(list_distinct(list_transform(range(1, len(hs)-2),
                i -> list_aggregate(hs[i:i+3], 'min'))))
           WHEN len(hs) > 0 THEN [list_aggregate(hs, 'min')]
           ELSE [] END AS fp FROM h)
       SELECT doc_id, len(fp) AS n_fp, md5(array_to_string(fp, ',')) AS fp_hash
       FROM f"""

  private val minhashSql: String = {
    val sigElems = (0 until 8).map(seed =>
      s"list_aggregate(list_transform(shingles, x -> md5('$seed|' || x)), 'min')")
      .mkString(", ")
    s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
       sh AS (SELECT doc_id, list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' ')) AS shingles FROM toks WHERE len(w) >= 3),
       sig AS (SELECT doc_id, [$sigElems] AS sig FROM sh),
       bands AS (SELECT doc_id, unnest([
         md5(concat_ws('|', 'band0', sig[1], sig[2], sig[3], sig[4])),
         md5(concat_ws('|', 'band1', sig[5], sig[6], sig[7], sig[8]))]) AS band_key FROM sig)
       SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id"""
  }

  /** q193 oracle: the q31 signature recipe (seeded md5-min per
    * component) evaluated per adjacent-id pair against the exact
    * distinct-trigram Jaccard — same 6-dp error grid, id-ordered fold.
    */
  private val minhashAccuracySql: String = {
    val sigElems = (0 until 8).map(seed =>
      s"list_aggregate(list_transform(shingles, x -> md5('$seed|' || x)), 'min')")
      .mkString(", ")
    s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
       sh AS (SELECT doc_id,
           list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))
             AS shingles
         FROM toks WHERE len(w) >= 3),
       d AS (SELECT doc_id, list_distinct(shingles) AS g,
           [$sigElems] AS sig FROM sh),
       pairs AS (SELECT a.doc_id AS id_a,
           round(abs(
             CAST(len(list_filter(range(1, 9), i -> a.sig[i] = b.sig[i]))
               AS DOUBLE) / CAST(8.0 AS DOUBLE)
             - CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE)), 6)
             AS err
         FROM d a JOIN d b ON b.doc_id = a.doc_id + 1)
       SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         round(list_sum(list(err ORDER BY id_a)) / CAST(count(*) AS DOUBLE), 6)
           AS avg_abs_err,
         max(err) AS max_abs_err
       FROM pairs"""
  }

  /** q196 oracle: brute-force all-pairs Jaccard as ground truth (proving
    * the engine's PPJoin-derived truth exact), the q31 signature pairs as
    * the candidate set, and per-threshold integer re-filters.
    */
  private val lshPrCurveSql: String = {
    val sigElems = (0 until 8).map(seed =>
      s"list_aggregate(list_transform(shingles, x -> md5('$seed|' || x)), 'min')")
      .mkString(", ")
    s"""WITH toks AS (SELECT doc_id, $tokSql AS w FROM documents),
       sh AS (SELECT doc_id,
           list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))
             AS shingles
         FROM toks WHERE len(w) >= 3),
       t AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh),
       truth AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
           CAST(len(a.s) AS BIGINT) + CAST(len(b.s) AS BIGINT)
             - CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS uni
         FROM t a JOIN t b ON a.doc_id < b.doc_id),
       sig AS (SELECT doc_id, [$sigElems] AS sig FROM sh),
       bands AS (SELECT doc_id, unnest([
         md5(concat_ws('|', 'band0', sig[1], sig[2], sig[3], sig[4])),
         md5(concat_ws('|', 'band1', sig[5], sig[6], sig[7], sig[8]))]) AS bk
         FROM sig),
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id),
       th AS (SELECT * FROM (VALUES (3, 10), (1, 2), (7, 10)) AS v(tn, td)),
       tc AS (SELECT tn, td, CAST(count(*) AS BIGINT) AS n_truth
         FROM th, truth WHERE inter * td >= uni * tn GROUP BY 1, 2),
       ct AS (SELECT tr.* FROM cand c JOIN truth tr USING (id_a, id_b)),
       hits AS (SELECT tn, td, CAST(count(*) AS BIGINT) AS hits
         FROM th, ct WHERE inter * td >= uni * tn GROUP BY 1, 2),
       nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand)
       SELECT th.tn, th.td, coalesce(tc.n_truth, 0) AS n_truth, nc.n_cand,
         coalesce(hits.hits, 0) AS hits,
         round(CAST(coalesce(hits.hits, 0) AS DOUBLE)
           / CAST(nc.n_cand AS DOUBLE), 6) AS prec,
         round(CAST(coalesce(hits.hits, 0) AS DOUBLE)
           / CAST(tc.n_truth AS DOUBLE), 6) AS recall
       FROM th LEFT JOIN tc USING (tn, td) LEFT JOIN hits USING (tn, td)
       CROSS JOIN nc"""
  }

  private val simhashSql: String = {
    val hexHigh = "('8','9','a','b','c','d','e','f')"
    val bitTerms = (0 until 16).map { bit =>
      s"""(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN substr(h, ${bit + 1}, 1) IN $hexHigh THEN 1 ELSE -1 END)) > 0 THEN ${1 << bit} ELSE 0 END)"""
    }.mkString(" + ")
    s"""SELECT doc_id, $bitTerms AS simhash FROM (
       SELECT doc_id, list_transform(list_distinct($tokSql), x -> md5(x)) AS hs FROM documents)"""
  }

  /** DuckDB replica of [[Similarity.hyperplanes]] + [[graft.functions.Vectors.hyperplaneBucket]]:
    * the LCG plane values are pure integer math (`(p·2654435761 + d·40503
    * + 12345) mod 2^32`, scaled to [-1,1)) and the dot is the same
    * sequential fold as the DotProduct kernel, so bucket ids agree
    * bit-for-bit across engines.
    */
  private def lshBucketCtes(nPlanes: Int): String =
    s"""ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       planes AS (SELECT p, list_transform(
           range(0, (SELECT len(embedding) FROM embeddings WHERE vec_id = 0)),
           d -> ((p*2654435761 + d*40503 + 12345) % 4294967296) / 2147483648.0 - 1.0) AS plane
         FROM range(0, $nPlanes) tp(p)),
       bucketed AS (SELECT vec_id,
           CAST(sum(CASE WHEN dp >= 0 THEN 1<<p ELSE 0 END) AS INTEGER) AS bucket
         FROM (SELECT e.vec_id, pl.p,
                 list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i] * pl.plane[i])) AS dp
               FROM ev e CROSS JOIN planes pl) GROUP BY vec_id)"""

  private val lshAnnSql: String =
    s"""WITH ${lshBucketCtes(6)},
       qb AS (SELECT bucket AS b0 FROM bucketed WHERE vec_id = 0),
       probes AS (SELECT b0 AS pb FROM qb
                  UNION SELECT xor(b0, 1<<p) FROM qb, range(0, 6) tp(p)),
       q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
       scored AS (SELECT vec_id,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dp/(na*nb) END AS cos
         FROM (SELECT e.vec_id,
                 list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*q.qv[i])) AS dp,
                 sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i]))) AS na,
                 sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*q.qv[i]))) AS nb
               FROM ev e JOIN bucketed b USING (vec_id), q
               WHERE b.bucket IN (SELECT pb FROM probes)))
       SELECT vec_id, round(cos, 4) AS cosine_sim FROM scored
       ORDER BY cos DESC, vec_id LIMIT 10"""

  /** Shared CTE chain ending in `pairs(id_a, id_b, cos)` — the bucketed
    * near-duplicate candidate pairs above `threshold`.
    */
  private def bucketedPairCtes(nPlanes: Int, threshold: Double): String =
    s"""${lshBucketCtes(nPlanes)},
       wn AS (SELECT e.vec_id, e.v, bk.bucket,
           sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i]))) AS nrm
         FROM ev e JOIN bucketed bk USING (vec_id)),
       cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) AS dp,
           a.nrm AS na, b.nrm AS nb
         FROM wn a JOIN wn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       scored_pairs AS (SELECT id_a, id_b,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dp/(na*nb) END AS cos FROM cand),
       pairs AS (SELECT id_a, id_b, cos FROM scored_pairs WHERE cos >= $threshold)"""

  private val bucketedNearPairsSql: String =
    s"""WITH ${bucketedPairCtes(4, 0.3)}
       SELECT id_a, id_b, round(cos, 4) AS cosine_sim FROM pairs"""

  /** Triangles a<b<c over the same pair graph (q108). */
  private val trianglesSql: String =
    s"""WITH ${bucketedPairCtes(4, 0.3)}
       SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c
       FROM pairs p1
       JOIN pairs p2 ON p2.id_a = p1.id_b
       JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b"""

  /** Near-dup clusters: undirected reachability over the pair graph, then
    * component = min reachable id (matches min-label propagation).
    */
  private val neardupComponentsSql: String =
    s"""WITH RECURSIVE ${bucketedPairCtes(4, 0.3)},
       edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       reach(a, b) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       SELECT a AS vec_id, least(a, min(b)) AS component
       FROM reach GROUP BY a"""

  // def, not val: qualitySql/langIdSql are declared later in the object
  // and a val here would capture null at initialization order.
  private def curationSql: String =
    s"""WITH qual AS ($qualitySql),
       lid AS ($langIdSql),
       f AS (SELECT d.doc_id, d.text, lid.pred_lang, qual.quality_score
             FROM documents d
             JOIN qual ON d.doc_id = qual.doc_id
             JOIN lid ON d.doc_id = lid.doc_id
             WHERE qual.quality_score >= 40 AND lid.pred_lang = lid.actual_lang),
       k AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(text))
       SELECT f.doc_id, f.pred_lang, f.quality_score
       FROM f JOIN k ON f.doc_id = k.doc_id"""

  /** DuckDB replica of the deterministic-centroid IVF (q67): centroids =
    * first 16 vectors; cell = argmin of `-2·(v·c)+|c|²` (ties → lower
    * cell); probe the 2 best cells for the query (= vector 0); exact
    * cosine top-10 inside them.
    */
  private val ivfSearchSql: String =
    """WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS c,
           list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i])) AS nsq
         FROM ev WHERE vec_id < 16),
       scores AS (SELECT e.vec_id, ct.cell,
           -2 * list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*ct.c[i])) + ct.nsq AS score
         FROM ev e CROSS JOIN cents ct),
       assign AS (SELECT vec_id, cell FROM (
           SELECT vec_id, cell,
             row_number() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
           FROM scores) WHERE rn = 1),
       q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
       probed AS (SELECT cell FROM (
           SELECT ct.cell, row_number() OVER (ORDER BY
               -2 * list_sum(list_transform(range(1, len(ct.c)+1), i -> ct.c[i]*q.qv[i])) + ct.nsq,
               ct.cell) AS rn
           FROM cents ct, q) WHERE rn <= 2),
       scored AS (SELECT vec_id, cell,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dp/(na*nb) END AS cos
         FROM (SELECT e.vec_id, a.cell,
                 list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*q.qv[i])) AS dp,
                 sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i]))) AS na,
                 sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*q.qv[i]))) AS nb
               FROM ev e JOIN assign a USING (vec_id), q
               WHERE a.cell IN (SELECT cell FROM probed)))
       SELECT vec_id, cell, round(cos, 4) AS cosine_sim FROM scored
       ORDER BY cos DESC, vec_id LIMIT 10"""

  /** q122 oracle building blocks: one Lloyd assignment (argmin of
    * `-2·dot + |c|²` over the centroid table, ties toward the lower
    * cell — the exact [[graft.operators.Ivf.assignCell]] order) and one
    * centroid update (per-dimension mean rounded to 6 dp; an emptied
    * cell keeps its previous centroid). Unrolled once per iteration —
    * SQL has no loop, and the fixed iteration count IS the determinism
    * contract (see Dedup.semanticDedup).
    */
  private def semAssignSql(cents: String, out: String): String =
    s"""$out AS (SELECT vec_id, cell FROM (
          SELECT e.vec_id, ct.cell, row_number() OVER (PARTITION BY e.vec_id
            ORDER BY -2 * list_sum(list_transform(range(1, 65), i -> e.v[i]*ct.c[i]))
              + list_sum(list_transform(range(1, 65), i -> ct.c[i]*ct.c[i])), ct.cell) AS rn
          FROM ev e CROSS JOIN $cents ct) WHERE rn = 1)"""

  private def semStepSql(assign: String, prev: String, m: String, next: String): String =
    s"""$m AS (SELECT a.cell, t.i, round(avg(e.v[t.i]), 6) AS m
          FROM $assign a JOIN ev e USING (vec_id) CROSS JOIN range(1, 65) t(i)
          GROUP BY a.cell, t.i),
        $next AS (SELECT p.cell, coalesce(n.c, p.c) AS c
          FROM $prev p LEFT JOIN (SELECT cell, list(m ORDER BY i) AS c
            FROM $m GROUP BY cell) n USING (cell))"""

  private val semanticDedupSql: String =
    s"""WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS c
         FROM (SELECT vec_id, v FROM ev ORDER BY vec_id LIMIT 8) s),
       ${semAssignSql("c0", "a1")},
       ${semStepSql("a1", "c0", "m1", "c1")},
       ${semAssignSql("c1", "a2")},
       ${semStepSql("a2", "c1", "m2", "c2")},
       ${semAssignSql("c2", "af")},
       pr AS (SELECT id_b AS id, min(id_a) AS dup_of FROM (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(range(1, 65), i -> ea.v[i]*eb.v[i])) AS dp,
             sqrt(list_sum(list_transform(range(1, 65), i -> ea.v[i]*ea.v[i]))) AS na,
             sqrt(list_sum(list_transform(range(1, 65), i -> eb.v[i]*eb.v[i]))) AS nb
           FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id
           JOIN ev ea ON ea.vec_id = a.vec_id
           JOIN ev eb ON eb.vec_id = b.vec_id)
         WHERE (CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dp/(na*nb) END)
           >= CAST(0.42 AS DOUBLE)
         GROUP BY id_b)
       SELECT e.vec_id, af.cell, p.dup_of, p.dup_of IS NOT NULL AS removed
       FROM ev e JOIN af USING (vec_id) LEFT JOIN pr p ON p.id = e.vec_id"""

  /** q123 oracle: same tokenize → tf/df/dl/avgdl → BM25 component →
    * ordered-fold sum pipeline as the Spark side; components rounded to
    * 6 dp before the term-ordered list_sum so both engines fold the same
    * grid in the same order (see the q123 scaladoc in `queries`).
    */
  private val bm25Sql: String =
    """WITH toks AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
         FROM documents),
       dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2),
       df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       comp AS (SELECT t.doc_id, t.term,
           round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
             (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS comp
         FROM tf t JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
       SELECT doc_id, round(list_sum(list(comp ORDER BY term)), 4) AS bm25
       FROM comp GROUP BY doc_id
       ORDER BY bm25 DESC, doc_id LIMIT 10"""

  /** q125 oracle: same unigram-LM pipeline; the per-position fold reuses
    * the q119 position idiom (generate_subscripts) and the q123 ordered
    * list_sum so both engines sum the 6-dp grid in position order.
    */
  private val perplexityFilterSql: String =
    """WITH pos AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term,
           generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1 AS pos
         FROM documents),
       lm AS (SELECT term, count(*) AS cnt FROM pos GROUP BY 1),
       tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM lm),
       lp AS (SELECT term, round(-ln(CAST(cnt AS DOUBLE) / total), 6) AS lp
         FROM lm CROSS JOIN tot),
       sc AS (SELECT doc_id, count(*) AS n_tokens,
           list_sum(list(lp ORDER BY pos)) AS nll
         FROM pos JOIN lp USING (term) GROUP BY doc_id)
       SELECT doc_id, n_tokens, round(nll / n_tokens, 4) AS avg_neg_logp,
         nll / n_tokens <= 3.45 AS keep
       FROM sc"""

  /** q126 oracle: unigram and adjacent-bigram counts, PMI as one
    * round(ln(ratio-of-exact-counts), 4), top-20 by (pmi desc, bigram).
    */
  private val pmiCollocationsSql: String =
    """WITH tk AS (SELECT regexp_split_to_array(trim(text), '\s+') AS w
         FROM documents),
       uc AS (SELECT tok, count(*) AS cnt
         FROM (SELECT unnest(w) AS tok FROM tk) GROUP BY 1),
       bc AS (SELECT bigram, count(*) AS cnt_ab
         FROM (SELECT unnest(list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i+1])) AS bigram FROM tk) GROUP BY 1),
       tu AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot_u FROM uc),
       tb AS (SELECT CAST(sum(cnt_ab) AS BIGINT) AS tot_b FROM bc)
       SELECT b.bigram, b.cnt_ab,
         round(ln((CAST(b.cnt_ab AS DOUBLE) / tot_b) /
           ((CAST(a.cnt AS DOUBLE) / tot_u) * (CAST(c.cnt AS DOUBLE) / tot_u))), 4)
           AS pmi
       FROM bc b
       JOIN uc a ON a.tok = string_split(b.bigram, ' ')[1]
       JOIN uc c ON c.tok = string_split(b.bigram, ' ')[2]
       CROSS JOIN tu CROSS JOIN tb
       WHERE b.cnt_ab >= 5
       ORDER BY pmi DESC, bigram LIMIT 20"""

  /** q127 oracle: same (source, term) partial agg feeding corpus counts
    * and per-source totals; contributions on the 6-dp grid summed in
    * term order (list_sum ORDER BY term ≡ the engine's ordered fold).
    */
  private val klDriftSql: String =
    """WITH st AS (SELECT source,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
         FROM documents),
       sc AS (SELECT source, term, count(*) AS cnt FROM st GROUP BY 1, 2),
       corpus AS (SELECT term, CAST(sum(cnt) AS BIGINT) AS ccnt
         FROM sc GROUP BY 1),
       ct AS (SELECT CAST(sum(ccnt) AS BIGINT) AS ctot FROM corpus),
       stt AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS stot
         FROM sc GROUP BY 1),
       comp AS (SELECT s.source, s.term, stot,
           round((CAST(s.cnt AS DOUBLE) / stot) *
             ln((CAST(s.cnt AS DOUBLE) / stot) /
                (CAST(ccnt AS DOUBLE) / ctot)), 6) AS kc
         FROM sc s JOIN corpus USING (term) JOIN stt USING (source)
         CROSS JOIN ct)
       SELECT source, count(*) AS n_terms,
         CAST(max(stot) AS BIGINT) AS n_tokens,
         round(list_sum(list(kc ORDER BY term)), 4) AS kl_vs_corpus
       FROM comp GROUP BY source"""

  /** q128 oracle: top-10 vocabulary by (count desc, term), coverage as a
    * ratio of exact counts.
    */
  private val vocabCoverageSql: String =
    """WITH st AS (SELECT source,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
         FROM documents),
       sc AS (SELECT source, term, count(*) AS cnt FROM st GROUP BY 1, 2),
       vocab AS (SELECT term FROM
         (SELECT term, sum(cnt) AS tc FROM sc GROUP BY 1)
         ORDER BY tc DESC, term LIMIT 10),
       j AS (SELECT s.source, s.cnt,
           CASE WHEN v.term IS NOT NULL THEN s.cnt ELSE 0 END AS cov
         FROM sc s LEFT JOIN vocab v USING (term))
       SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         round(CAST(sum(cov) AS DOUBLE) / sum(cnt), 6) AS coverage,
         round(1.0 - CAST(sum(cov) AS DOUBLE) / sum(cnt), 6) AS oov_rate
       FROM j GROUP BY source"""

  /** q129 oracle: trigram instances per doc, document frequency from the
    * per-doc-distinct frame, novelty = df=1 instance fraction.
    */
  private val ngramNoveltySql: String =
    """WITH tk AS (SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS w
         FROM documents),
       sh AS (SELECT doc_id, g, count(*) AS cnt FROM
         (SELECT doc_id,
            unnest(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
          FROM tk WHERE len(w) >= 3)
         GROUP BY 1, 2),
       df AS (SELECT g, count(*) AS df FROM sh GROUP BY 1)
       SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_shingles,
         round(CAST(sum(CASE WHEN df = 1 THEN cnt ELSE 0 END) AS DOUBLE)
           / sum(cnt), 6) AS novelty
       FROM sh JOIN df USING (g) GROUP BY doc_id"""

  /** q130 oracle: md5 hex prefix bands — identical lowercase hex and
    * ASCII ordering in both engines.
    */
  private val hashSplitSql: String =
    """SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'test'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'val'
              ELSE 'train' END AS split
       FROM documents"""

  /** q124 oracle: q72's recursive-CTE connected components over the
    * LSH-bucketed pair graph, joined to the q36 quality score, with the
    * survivor argmax as the same min-of-struct idiom the engine uses.
    */
  private def dedupSurvivorsSql: String =
    s"""WITH RECURSIVE ${bucketedPairCtes(4, 0.3)},
       edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       reach(a, b) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       cc AS (SELECT a AS vertex, least(a, min(b)) AS component
              FROM reach GROUP BY a),
       qual AS ($qualitySql),
       j AS (SELECT cc.component, cc.vertex AS doc_id, q.quality_score AS q
             FROM cc JOIN qual q ON q.doc_id = cc.vertex),
       m AS (SELECT component, count(*) AS n_members,
               min({'nq': -q, 'id': doc_id}) AS ms
             FROM j GROUP BY component)
       SELECT component, struct_extract(ms, 'id') AS survivor_doc_id,
         n_members, -struct_extract(ms, 'nq') AS survivor_quality
       FROM m"""

  /** q139 oracle: water-filling allocation over per-source token counts
    * (also embedded as a CTE by q141's mix-apply oracle).
    */
  private val budgetAllocSql: String =
    """WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
           FROM (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
                 FROM documents)
           GROUP BY source),
         o AS (SELECT source, n_tokens,
             CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS i,
             CAST(sum(n_tokens) OVER (ORDER BY n_tokens, source
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_i,
             CAST(count(*) OVER () AS BIGINT) AS n
           FROM st),
         p AS (SELECT *,
             CASE WHEN n_tokens * (n - i + 1) <= 26000 - (s_i - n_tokens)
                  THEN i END AS pi,
             CASE WHEN n_tokens * (n - i + 1) <= 26000 - (s_i - n_tokens)
                  THEN s_i END AS psi
           FROM o),
         kk AS (SELECT *, max(pi) OVER () AS k, max(psi) OVER () AS sk FROM p)
         SELECT source, n_tokens,
           round(CASE WHEN k IS NOT NULL AND i <= k THEN CAST(n_tokens AS DOUBLE)
                      WHEN k IS NULL THEN CAST(26000 AS DOUBLE) / n
                      ELSE (26000 - sk) / CAST(n - k AS DOUBLE) END, 4)
             AS alloc_tokens,
           (k IS NOT NULL AND i <= k) AS fully_used
         FROM kk"""

  /** q83 oracle (also the CTE of q143's repetition gate): per-doc
    * top-/duplicated-gram fractions at word and bigram granularity.
    */
  private val repetitionSql: String =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
           FROM documents),
         words AS (SELECT doc_id, unnest(t) AS g FROM toks),
         wc AS (SELECT doc_id, g, count(*) AS cnt FROM words GROUP BY doc_id, g),
         ws AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total,
                  CAST(max(cnt) AS BIGINT) AS top,
                  CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup
                FROM wc GROUP BY doc_id),
         bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(t)),
                    i -> array_to_string(t[i:i+1], ' '))) AS g
                FROM toks WHERE len(t) >= 2),
         bc AS (SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY doc_id, g),
         bs AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total,
                  CAST(max(cnt) AS BIGINT) AS top,
                  CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup
                FROM bc GROUP BY doc_id)
         SELECT w.doc_id, w.total AS n_words,
           CAST(w.top AS DOUBLE) / CAST(w.total AS DOUBLE) AS top_word_frac,
           CAST(w.dup AS DOUBLE) / CAST(w.total AS DOUBLE) AS dup_word_frac,
           CAST(b.top AS DOUBLE) / CAST(b.total AS DOUBLE) AS top_bigram_frac,
           CAST(b.dup AS DOUBLE) / CAST(b.total AS DOUBLE) AS dup_bigram_frac
         FROM ws w JOIN bs b ON w.doc_id = b.doc_id"""

  /** The q36 quality projection with `source` carried through (q142's
    * per-source quantile gate needs it).
    */
  private def qualityWithSourceSql: String = qualitySql
    .replace("SELECT doc_id, len(w) AS n_tokens,",
      "SELECT doc_id, source, len(w) AS n_tokens,")
    .replace("FROM (SELECT doc_id, regexp_split_to_array",
      "FROM (SELECT doc_id, source, regexp_split_to_array")

  /** q136 oracle: q124's component/survivor CTEs, applied as a keep-list
    * against the corpus (untouched docs kept as 'unique', survivors kept,
    * all other component members dropped).
    */
  /** Shared CTE chain for the q124/q136/q155 family: LSH pair graph →
    * reachability components → per-component quality-argmax survivor.
    */
  private def dedupKeepCtes: String =
    s"""${bucketedPairCtes(4, 0.3)},
       edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       reach(a, b) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       cc AS (SELECT a AS vertex, least(a, min(b)) AS component
              FROM reach GROUP BY a),
       qual AS ($qualitySql),
       j AS (SELECT cc.component, cc.vertex AS doc_id, q.quality_score AS q
             FROM cc JOIN qual q ON q.doc_id = cc.vertex),
       m AS (SELECT component, min({'nq': -q, 'id': doc_id}) AS ms
             FROM j GROUP BY component),
       surv AS (SELECT struct_extract(ms, 'id') AS sid FROM m)"""

  private def dedupApplySql: String =
    s"""WITH RECURSIVE $dedupKeepCtes
       SELECT d.doc_id,
         CASE WHEN cc.vertex IS NULL THEN 'unique' ELSE 'survivor' END AS status
       FROM documents d
       LEFT JOIN cc ON d.doc_id = cc.vertex
       LEFT JOIN surv ON d.doc_id = surv.sid
       WHERE cc.vertex IS NULL OR surv.sid IS NOT NULL"""

  private val cosineSqlBody =
    """list_sum(list_transform(range(1, len(ev)+1), i -> ev[i]*qv[i]))
       / (sqrt(list_sum(list_transform(range(1, len(ev)+1), i -> ev[i]*ev[i])))
        * sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i]))))"""

  private val qualitySql: String =
    """SELECT doc_id, len(w) AS n_tokens,
       CAST(CASE WHEN nc >= 100 AND nc <= 20000 THEN 40.0 WHEN nc >= 20 THEN 20.0 ELSE 0.0 END
      + CASE WHEN (CASE WHEN len(w) > 0 THEN nc / CAST(len(w) AS DOUBLE) ELSE 0.0 END) >= 3
              AND (CASE WHEN len(w) > 0 THEN nc / CAST(len(w) AS DOUBLE) ELSE 0.0 END) <= 12
             THEN 30.0 ELSE 10.0 END
      + CASE WHEN (CASE WHEN nc > 0 THEN np / nc ELSE 1.0 END) <= 0.1 THEN 30.0
             WHEN (CASE WHEN nc > 0 THEN np / nc ELSE 1.0 END) <= 0.3 THEN 15.0
             ELSE 0.0 END AS DOUBLE) AS quality_score
       FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w,
                    CAST(length(text) AS DOUBLE) AS nc,
                    CAST(length(text) - length(regexp_replace(text, '[.,;:!?()-]', '', 'g')) AS DOUBLE) AS np
             FROM documents)"""

  // q121 is the xxhash64-gram-key variant of q118 — bit-identical by
  // contract (see Dedup.removeDuplicateSpans), so it shares the
  // exact-path oracle verbatim.
  // q203/q204 are the scale-safe (banded two-pass) rewrites of q200/q182
  // — exact by construction, so they share those oracles verbatim.
  def oracleSql: Map[String, String] =
    oracleSqlBase +
      ("q121_dedup_spans_hash" -> oracleSqlBase("q118_dedup_spans")) +
      ("q203_pareto_scaled" -> oracleSqlBase("q200_pareto_revenue")) +
      ("q204_quantile_scaled" -> oracleSqlBase("q182_quantile_normalize"))

  private val oracleSqlBase: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q85_bloom_pruned_join" ->
      """SELECT p_brand, count(*) AS n_items,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size = 1 GROUP BY p_brand""",
    "q02_fk_dim_join" ->
      """SELECT r_name AS region_name, n_name AS nation_name, count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q03_revenue_by_nation" ->
      """SELECT n_name AS nation_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
         GROUP BY n_name""",
    "q04_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q05_semi_join" ->
      """SELECT p_partkey, p_name FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_discount > 0.07)""",
    "q06_full_outer" ->
      """SELECT COALESCE(o.day, l.day) AS day, COALESCE(n_orders, 0) AS n_orders,
         COALESCE(n_ships, 0) AS n_ships FROM
         (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n_orders FROM orders GROUP BY 1) o
         FULL OUTER JOIN
         (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day, count(*) AS n_ships FROM lineitem GROUP BY 1) l
         ON o.day = l.day""",
    "q07_self_join" ->
      """SELECT a.n_regionkey AS region_key, a.n_name AS nation_a, b.n_name AS nation_b
         FROM nation a JOIN nation b
         ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name""",
    "q08_expr_join" ->
      """WITH dim AS (SELECT DISTINCT o_orderstatus || '|' || o_orderpriority AS class_key FROM orders),
         dim2 AS (SELECT class_key, CAST(dense_rank() OVER (ORDER BY class_key) AS INTEGER) AS class_id FROM dim)
         SELECT class_id, class_key, count(*) AS n_orders
         FROM orders JOIN dim2 ON o_orderstatus || '|' || o_orderpriority = class_key
         GROUP BY class_id, class_key""",
    "q09_exactly_one" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         uniq AS (SELECT l_partkey FROM ps GROUP BY 1 HAVING count(*) = 1)
         SELECT p_partkey, p_name, l_suppkey AS sole_suppkey
         FROM part JOIN ps ON p_partkey = ps.l_partkey JOIN uniq ON ps.l_partkey = uniq.l_partkey""",
    "q10_collect_set" ->
      """SELECT o_orderpriority,
         string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
         count(*) AS n_orders FROM orders GROUP BY o_orderpriority""",
    "q11_conditional_agg" ->
      """SELECT l_returnflag,
         CAST(sum(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
         CAST(sum(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree,
         count(*) AS n_total FROM lineitem GROUP BY l_returnflag""",
    "q12_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
         SELECT o_custkey, o_orderkey,
         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
         FROM orders) WHERE rn <= 2""",
    "q13_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
           PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
         FROM lineitem WHERE l_suppkey <= 5""",
    "q14_recode" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
                     WHEN o_totalprice < 10000 THEN 'medium'
                     WHEN o_totalprice < 100000 THEN 'large'
                     ELSE 'jumbo' END AS size_class,
         o_orderstatus, count(*) AS n, min(o_totalprice) AS min_price,
         max(o_totalprice) AS max_price
         FROM orders GROUP BY size_class, o_orderstatus""",
    "q15_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q16_union" ->
      """SELECT kind, count(*) AS n,
         CAST(sum(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal FROM (
         SELECT c_name AS entity_name, 'customer' AS kind, c_acctbal AS acctbal FROM customer
         UNION ALL
         SELECT s_name, 'supplier', s_acctbal FROM supplier) GROUP BY kind""",
    "q17_array_ops" ->
      """SELECT p_partkey,
         array_to_string(list_sort(list_distinct(list_filter(string_split(p_name, ' '),
           x -> NOT list_contains(['small','red'], x)))), ' ') AS kept_words,
         len(list_distinct(list_filter(string_split(p_name, ' '),
           x -> list_contains(['small','red','blue'], x)))) AS n_marked
         FROM part""",
    "q18_string_funcs" ->
      """SELECT c_custkey, upper(trim(c_name)) AS name_upper,
         replace(lower(c_mktsegment), 'a', '@') AS seg_coded,
         substr(c_name, 1, 8) AS name_prefix, length(c_name) AS name_len
         FROM customer""",
    "q19_regexp" ->
      """SELECT c_custkey, regexp_extract(c_name, '([0-9]+)$', 1) AS cust_num,
         regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_novowel
         FROM customer""",
    "q20_explode_wordcount" ->
      """SELECT word, count(*) AS n FROM (
         SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
         GROUP BY word ORDER BY n DESC, word LIMIT 20""",
    "q21_json" ->
      """SELECT event_type, CAST(sum(k_val) AS BIGINT) AS sum_k, max(k_val) AS max_k, count(*) AS n
         FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val FROM events)
         GROUP BY event_type""",
    "q22_null_handling" ->
      """SELECT l_returnflag,
         CAST(sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         count(d) AS n_nonnull, CAST(sum(CAST(d AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
         FROM (SELECT l_returnflag, CASE WHEN l_discount = 0 THEN NULL ELSE l_discount END AS d
               FROM lineitem) GROUP BY l_returnflag""",
    "q23_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q24_hourly_events" ->
      """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:00') AS hour,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1, 2""",
    "q25_dense_id" ->
      """SELECT p_brand, CAST(dense_rank() OVER (ORDER BY p_brand) AS INTEGER) AS brand_id
         FROM (SELECT DISTINCT p_brand FROM part)""",
    "q26_binning" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN '0-1k'
                     WHEN o_totalprice < 10000 THEN '1k-10k'
                     WHEN o_totalprice < 100000 THEN '10k-100k'
                     ELSE '100k+' END AS bucket,
         count(*) AS n, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
         FROM orders GROUP BY bucket""",
    "q28_sorted_array_join" ->
      """SELECT array_to_string(list_sort(string_split(p_name, ' ')), ' ') AS word_bag,
         count(*) AS n_parts, min(p_partkey) AS min_partkey
         FROM part GROUP BY 1 HAVING count(*) > 1""",
    "q29_nullsafe_join" ->
      """WITH o AS (SELECT CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS pk,
                    o_totalprice FROM orders),
         a AS (SELECT pk, count(*) AS n_a FROM o GROUP BY pk),
         b AS (SELECT pk, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_b FROM o GROUP BY pk)
         SELECT a.pk AS status_key, n_a, total_b FROM a JOIN b ON a.pk IS NOT DISTINCT FROM b.pk""",
    "q42_sessionize" ->
      """SELECT user_id,
         CAST(sum(CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
         count(*) AS n_events
         FROM (SELECT user_id, ts, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
               FROM events) GROUP BY user_id""",
    "q44_pivot" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
         FROM orders GROUP BY o_orderpriority""",
    "q30_exact_dedup" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_id
         FROM documents GROUP BY 1 HAVING count(*) > 1""",
    "q31_minhash_lsh" -> minhashSql,
    "q32_simhash" -> simhashSql,
    "q33_ngram_jaccard" ->
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CASE WHEN len(list_distinct(list_concat(
             list_distinct(regexp_split_to_array(trim(a.text), '\\s+')),
             list_distinct(regexp_split_to_array(trim(b.text), '\\s+'))))) = 0 THEN 0.0
         ELSE CAST(len(list_intersect(
             list_distinct(regexp_split_to_array(trim(a.text), '\\s+')),
             list_distinct(regexp_split_to_array(trim(b.text), '\\s+')))) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(
             list_distinct(regexp_split_to_array(trim(a.text), '\\s+')),
             list_distinct(regexp_split_to_array(trim(b.text), '\\s+'))))) AS DOUBLE) END AS jaccard
         FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1""",
    "q34_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(
           regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS fingerprint,
         count(*) AS n_docs, min(doc_id) AS keep_id
         FROM documents GROUP BY 1 HAVING count(*) > 1""",
    "q90_incremental_dedup" ->
      """WITH f AS (SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS fingerprint
           FROM documents),
         inc AS (SELECT fingerprint, CAST(min(doc_id) AS BIGINT) AS doc_id
           FROM f WHERE doc_id % 10 = 0 GROUP BY fingerprint)
         SELECT doc_id, fingerprint FROM inc
         WHERE NOT EXISTS (SELECT 1 FROM f c
           WHERE c.doc_id % 10 <> 0 AND c.fingerprint = inc.fingerprint)""",
    "q35_lang_id" -> langIdSql,
    "q60_langid_ngram" -> ngramLangSql,
    "q61_winnowing" -> winnowingSql,
    "q62_sql_kernels" -> simhashSql,
    "q36_quality" -> qualitySql,
    "q83_repetition" -> repetitionSql,
    "q143_repetition_gate" ->
      s"""WITH r AS ($repetitionSql)
         SELECT doc_id, n_words,
           CAST(CASE WHEN top_word_frac > 0.3 THEN 1 ELSE 0 END
              + CASE WHEN dup_word_frac > 0.4 THEN 1 ELSE 0 END
              + CASE WHEN top_bigram_frac > 0.2 THEN 1 ELSE 0 END
              + CASE WHEN dup_bigram_frac > 0.6 THEN 1 ELSE 0 END AS INT)
             AS n_violations,
           top_word_frac <= 0.3 AND dup_word_frac <= 0.4
             AND top_bigram_frac <= 0.2 AND dup_bigram_frac <= 0.6 AS keep
         FROM r""",
    "q144_source_overlap" ->
      """WITH tk AS (SELECT source, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         sh AS (SELECT DISTINCT source, g FROM
           (SELECT source, unnest(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
            FROM tk WHERE len(w) >= 3)),
         cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
         shared AS (SELECT a.source AS sa, b.source AS sb,
             CAST(count(*) AS BIGINT) AS n_shared
           FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
           GROUP BY 1, 2)
         SELECT ca.source AS source_a, cb.source AS source_b,
           CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
           ca.n AS n_a, cb.n AS n_b,
           round(CAST(coalesce(n_shared, 0) AS DOUBLE)
             / (ca.n + cb.n - coalesce(n_shared, 0)), 6) AS jaccard
         FROM cnt ca JOIN cnt cb ON ca.source < cb.source
         LEFT JOIN shared ON shared.sa = ca.source AND shared.sb = cb.source""",
    "q145_boilerplate_prefix" ->
      """WITH g AS (SELECT substr(lower(trim(text)), 1, 30) AS prefix,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             min(doc_id) AS first_doc_id
           FROM documents GROUP BY 1 HAVING count(*) >= 2)
         SELECT prefix, n_docs, n_sources, first_doc_id
         FROM g ORDER BY n_docs DESC, prefix LIMIT 20""",
    "q37_token_count" ->
      """SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpeish_tokens
         FROM documents""",
    "q89_heavy_hitters" ->
      """WITH c AS (SELECT lang, source, count(*) AS cnt
           FROM documents GROUP BY lang, source),
         r AS (SELECT lang, source, cnt,
             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, source) AS rk
           FROM c)
         SELECT lang, source, CAST(cnt AS BIGINT) AS cnt FROM r WHERE rk <= 3""",
    "q119_vocab_encode" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS token,
             generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1 AS pos
           FROM documents),
         vocab AS (
           SELECT token,
             CAST(row_number() OVER (ORDER BY count(*) DESC, token) AS INTEGER) AS token_id
           FROM toks GROUP BY token
           QUALIFY token_id <= 1000)
         SELECT t.doc_id,
           string_agg(CAST(coalesce(v.token_id, 0) AS VARCHAR), ' ' ORDER BY t.pos)
             AS token_ids
         FROM toks t LEFT JOIN vocab v ON t.token = v.token
         GROUP BY t.doc_id""",
    // End-to-end registry replay: the whole raw→search_index chain in
    // SQL over the SAME staged fixture files the engine reads —
    // TSV/YAML via read_csv, mapping rules via read_json_auto, the OBO
    // stanzas via read_text + regex, the ancestor closure via recursive
    // CTEs (branch roots excluded, like OntologyGraph.branch), and the
    // display-rename/score arithmetic inline.
    "q120_search_index_e2e" ->
      """WITH RECURSIVE
         raw_patient AS (
           SELECT patient_id, sex, history, ethnicity, ethnicity_assessment_method,
                  age_at_initial_diagnosis, initial_diagnosis,
                  regexp_extract(filename, '.*/([^/]+)/[^/]+$', 1) AS data_source
           FROM read_csv('/root/repo/target/q120_fixtures/*/patient.tsv',
             delim='\t', header=true, all_varchar=true, filename=true)),
         raw_sample AS (
           SELECT *, regexp_extract(filename, '.*/([^/]+)/[^/]+$', 1) AS data_source
           FROM read_csv('/root/repo/target/q120_fixtures/*/sample.tsv',
             delim='\t', header=true, all_varchar=true, filename=true)),
         raw_model AS (
           SELECT *, regexp_extract(filename, '.*/([^/]+)/[^/]+$', 1) AS data_source
           FROM read_csv('/root/repo/target/q120_fixtures/*/model.tsv',
             delim='\t', header=true, all_varchar=true, filename=true)),
         raw_sharing AS (
           SELECT *, regexp_extract(filename, '.*/([^/]+)/[^/]+$', 1) AS data_source
           FROM read_csv('/root/repo/target/q120_fixtures/*/sharing.tsv',
             delim='\t', header=true, all_varchar=true, filename=true)),
         raw_mcs AS (
           SELECT *, regexp_extract(filename, '.*/([^/]+)/[^/]+$', 1) AS data_source
           FROM read_csv('/root/repo/target/q120_fixtures/*/molchar_sample.tsv',
             delim='\t', header=true, all_varchar=true, filename=true)),
         raw_mcp AS (
           SELECT *, regexp_extract(filename, '.*/([^/]+)/[^/]+$', 1) AS data_source
           FROM read_csv('/root/repo/target/q120_fixtures/*/molchar_platform.tsv',
             delim='\t', header=true, all_varchar=true, filename=true)),
         raw_dd AS (
           SELECT *, regexp_extract(filename, '.*/([^/]+)/[^/]+$', 1) AS data_source
           FROM read_csv('/root/repo/target/q120_fixtures/*/drug-dosing.tsv',
             delim='\t', header=true, all_varchar=true, filename=true)),
         raw_pt AS (
           SELECT *, regexp_extract(filename, '.*/([^/]+)/[^/]+$', 1) AS data_source
           FROM read_csv('/root/repo/target/q120_fixtures/*/patient-treatment.tsv',
             delim='\t', header=true, all_varchar=true, filename=true)),
         raw_ontolia AS (
           SELECT trim(split_part(line, '=', 1)) AS regimen_id,
                  trim(unnest(string_split(split_part(line, '=', 2), ','))) AS comp_id
           FROM read_csv('/root/repo/target/q120_fixtures/ontolia.txt',
             delim='\t', quote='', header=false, all_varchar=true, names=['line'])
           WHERE contains(line, '=')),
         src_kv AS (
           SELECT trim(split_part(line, ':', 1)) AS k,
                  trim(substr(line, strpos(line, ':') + 1)) AS v,
                  regexp_extract(filename, '.*/([^/]+)/[^/]+$', 1) AS data_source
           FROM read_csv('/root/repo/target/q120_fixtures/*/source.yaml',
             delim='\t', quote='', header=false, all_varchar=true, filename=true,
             names=['line'])),
         raw_source AS (
           SELECT data_source,
             max(CASE WHEN k = 'provider_name' THEN v END) AS provider_name,
             max(CASE WHEN k = 'project' THEN v END) AS project
           FROM src_kv GROUP BY data_source),
         rules AS (
           SELECT lower(trim(m.data_source)) AS r_ds, lower(trim(m.diagnosis)) AS r_diag,
                  lower(trim(m.primary_site)) AS r_site, lower(trim(m.tumour_type)) AS r_tt,
                  m.mapped_term_id
           FROM (SELECT unnest(mappings) AS m
                 FROM read_json_auto('/root/repo/target/q120_fixtures/diagnosis_mappings.json'))),
         obo_terms AS (
           SELECT
             trim(regexp_extract(stanza_text, '(?m)^\s*id: *([^\n]*)', 1)) AS term_id,
             trim(regexp_replace(
               trim(regexp_extract(stanza_text, '(?m)^\s*name: *([^\n]*)', 1)),
               '\s+', ' ', 'g')) AS term_name,
             regexp_extract_all(stanza_text, '(?m)^\s*is_a: *([^\n]*)', 1) AS is_a_refs
           FROM (SELECT unnest(string_split(content, '[Term]')) AS stanza_text
                 FROM read_text('/root/repo/target/q120_fixtures/ncit.obo'))
           WHERE regexp_matches(stanza_text, '(?m)^\s*id: ')),
         obo_edges AS (
           SELECT term_id AS child, trim(split_part(ref, '!', 1)) AS parent
           FROM (SELECT term_id, unnest(is_a_refs) AS ref FROM obo_terms)),
         desc_terms AS (
           SELECT child AS id FROM obo_edges WHERE parent IN ('NCIT:C3262', 'NCIT:C9305')
           UNION
           SELECT e.child FROM obo_edges e, desc_terms d WHERE e.parent = d.id),
         branch_edges AS (
           SELECT DISTINCT e.child, e.parent FROM obo_edges e
           WHERE e.child IN (SELECT id FROM desc_terms)
             AND e.parent IN (SELECT id FROM desc_terms)),
         anc AS (
           SELECT child AS id, parent AS anc FROM branch_edges
           UNION
           SELECT a.id, e.parent FROM anc a JOIN branch_edges e ON a.anc = e.child),
         anc_names AS (
           SELECT a.id, string_agg(tn.term_name, '|' ORDER BY tn.term_name) AS ancestors
           FROM (SELECT DISTINCT id, anc FROM anc) a
           JOIN obo_terms tn ON tn.term_id = a.anc
           GROUP BY a.id),
         onto AS (
           SELECT t.term_id, t.term_name, coalesce(an.ancestors, '') AS ancestors
           FROM obo_terms t LEFT JOIN anc_names an ON an.id = t.term_id
           WHERE t.term_id IN (SELECT id FROM desc_terms)),
         desc_treat AS (
           SELECT child AS id FROM obo_edges WHERE parent IN
             ('NCIT:C1932', 'NCIT:C1505', 'NCIT:C1913', 'NCIT:C45678', 'NCIT:C1909',
              'NCIT:C1899', 'NCIT:C15431', 'NCIT:C49236', 'NCIT:C15206', 'NCIT:C26548')
           UNION
           SELECT e.child FROM obo_edges e, desc_treat d WHERE e.parent = d.id),
         branch_edges_treat AS (
           SELECT DISTINCT e.child, e.parent FROM obo_edges e
           WHERE e.child IN (SELECT id FROM desc_treat)
             AND e.parent IN (SELECT id FROM desc_treat)),
         anc_treat AS (
           SELECT child AS id, parent AS anc FROM branch_edges_treat
           UNION
           SELECT a.id, e.parent FROM anc_treat a JOIN branch_edges_treat e ON a.anc = e.child),
         onto_treat AS (
           SELECT t.term_id, t.term_name,
             coalesce(an.ancestors, '') AS ancestors
           FROM obo_terms t
           LEFT JOIN (SELECT a.id, string_agg(tn.term_name, '|' ORDER BY tn.term_name) AS ancestors
                      FROM (SELECT DISTINCT id, anc FROM anc_treat) a
                      JOIN obo_terms tn ON tn.term_id = a.anc GROUP BY a.id) an
             ON an.id = t.term_id
           WHERE t.term_id IN (SELECT id FROM desc_treat)),
         desc_reg AS (
           SELECT child AS id FROM obo_edges WHERE parent IN ('NCIT:C12218')
           UNION
           SELECT e.child FROM obo_edges e, desc_reg d WHERE e.parent = d.id),
         branch_edges_reg AS (
           SELECT DISTINCT e.child, e.parent FROM obo_edges e
           WHERE e.child IN (SELECT id FROM desc_reg)
             AND e.parent IN (SELECT id FROM desc_reg)),
         anc_reg AS (
           SELECT child AS id, parent AS anc FROM branch_edges_reg
           UNION
           SELECT a.id, e.parent FROM anc_reg a JOIN branch_edges_reg e ON a.anc = e.child),
         onto_reg AS (
           SELECT t.term_id, t.term_name,
             coalesce(an.ancestors, '') AS ancestors
           FROM obo_terms t
           LEFT JOIN (SELECT a.id, string_agg(tn.term_name, '|' ORDER BY tn.term_name) AS ancestors
                      FROM (SELECT DISTINCT id, anc FROM anc_reg) a
                      JOIN obo_terms tn ON tn.term_id = a.anc GROUP BY a.id) an
             ON an.id = t.term_id
           WHERE t.term_id IN (SELECT id FROM desc_reg)),
         proto_base AS (
           SELECT model_id AS target_id, 'model' AS target_kind, model_id, data_source,
                  treatment_name, treatment_dose, treatment_response
           FROM raw_dd
           UNION ALL
           SELECT patient_id, 'patient', model_id, data_source,
                  treatment_name, treatment_dose, treatment_response
           FROM raw_pt),
         components AS (
           SELECT target_id, target_kind, model_id, data_source, treatment_response,
             concat_ws(chr(30), target_id, target_kind, treatment_name,
               treatment_dose, data_source) AS protocol_key,
             trim(unnest(string_split(treatment_name, '+'))) AS comp_name
           FROM proto_base
           WHERE len(string_split(treatment_name, '+'))
               = len(string_split(treatment_dose, '+'))),
         harmonised AS (
           SELECT c.protocol_key, o.term_name,
             list_filter(
               ['Hormone Therapy', 'Immunotherapy', 'Targeted Therapy',
                'Chemotherapy', 'Surgery', 'Radiation Therapy'],
               ty -> len(list_filter(
                 list_append(string_split(coalesce(o.ancestors, ''), '|'), o.term_name),
                 a -> CASE ty
                   WHEN 'Hormone Therapy' THEN contains(lower(a), 'hormone therapy')
                   WHEN 'Immunotherapy' THEN contains(lower(a), 'cytokine')
                     OR contains(lower(a), 'immunotherapeutic')
                     OR contains(lower(a), 'immunomodulatory')
                   WHEN 'Targeted Therapy' THEN contains(lower(a), 'targeted therapy')
                     OR contains(lower(a), 'targeting')
                   WHEN 'Chemotherapy' THEN contains(lower(a), 'chemotherapy')
                     OR contains(lower(a), 'chemotherapeutic')
                   WHEN 'Surgery' THEN contains(lower(a), 'surgery')
                     OR contains(lower(a), 'mammoplasty') OR contains(lower(a), 'ectomy')
                     OR contains(lower(a), 'biopsy') OR contains(lower(a), 'plasty')
                   WHEN 'Radiation Therapy' THEN contains(lower(a), 'radiation therapy')
                   END)) > 0) AS types,
             o.cls AS class
           FROM components c
           JOIN (SELECT term_name, ancestors, 'treatment' AS cls FROM onto_treat
                 UNION ALL
                 SELECT term_name, ancestors, 'regimen' FROM onto_reg) o
             ON lower(trim(replace(c.comp_name, chr(160), ' '))) = lower(o.term_name)),
         r2t AS (
           SELECT reg.term_name AS regimen, tr.term_name AS treatment
           FROM raw_ontolia p
           JOIN onto_reg reg ON p.regimen_id = reg.term_id
           JOIN onto_treat tr ON p.comp_id = tr.term_id),
         by_protocol AS (
           SELECT protocol_key, list_sort(list(term_name)) AS treatment_list,
             list_distinct(flatten(list(types))) AS types
           FROM harmonised WHERE class = 'treatment' GROUP BY protocol_key),
         by_regimen AS (
           SELECT regimen, list(treatment) AS component_list FROM r2t GROUP BY regimen),
         all_terms AS (
           SELECT protocol_key, term_name, types, class FROM harmonised
           UNION ALL
           SELECT h.protocol_key, r.treatment, h.types, NULL
           FROM harmonised h JOIN r2t r ON h.term_name = r.regimen
           WHERE h.class = 'regimen'
           UNION ALL
           SELECT bp.protocol_key, br.regimen, bp.types, NULL
           FROM by_protocol bp JOIN by_regimen br
             ON list_sort(bp.treatment_list) = list_sort(br.component_list)),
         proto AS (
           SELECT DISTINCT protocol_key, model_id, data_source, target_kind,
             treatment_response
           FROM components),
         tbm_grouped AS (
           SELECT model_id, data_source, target_kind,
             list_sort(list_distinct(coalesce(list(lower(term_name))
               FILTER (WHERE term_name IS NOT NULL), []))) AS treatments,
             list_sort(list_distinct(flatten(coalesce(list(types)
               FILTER (WHERE types IS NOT NULL), [])))) AS types,
             list_sort(list_distinct(coalesce(list(treatment_response)
               FILTER (WHERE treatment_response IS NOT NULL), []))) AS responses
           FROM (SELECT DISTINCT p.model_id, p.data_source, p.target_kind,
                   p.treatment_response, a.term_name, a.types, a.class
                 FROM proto p LEFT JOIN all_terms a USING (protocol_key))
           GROUP BY model_id, data_source, target_kind),
         tbm AS (
           SELECT coalesce(m.model_id, p.model_id) AS model_id,
             coalesce(m.data_source, p.data_source) AS data_source,
             m.treatments AS model_treatments,
             m.responses AS model_treatments_responses,
             p.treatments AS patient_treatments,
             p.responses AS patient_treatments_responses,
             list_sort(list_distinct(coalesce(m.types, []) || coalesce(p.types, [])))
               AS treatment_types
           FROM (SELECT * FROM tbm_grouped WHERE target_kind = 'model') m
           FULL OUTER JOIN (SELECT * FROM tbm_grouped WHERE target_kind = 'patient') p
             ON m.model_id = p.model_id AND m.data_source = p.data_source),
         s2o AS (
           SELECT s.sample_id, s.data_source, o.term_name, o.ancestors,
             CASE WHEN o.term_name IS NULL THEN NULL
               ELSE list_transform(
                 string_split(concat_ws('|', o.term_name, o.ancestors), '|'),
                 x -> trim(regexp_replace(
                   CASE WHEN contains(x, 'Malignant')
                     THEN regexp_replace(x, '(.*)Malignant(.*)Neoplasm(.*)', '\1\2Cancer\3')
                     ELSE regexp_replace(x, '(.*)Neoplasm(.*)', '\1Cancer\2') END,
                   '\s+', ' ', 'g'))) END AS display_list
           FROM raw_sample s
           LEFT JOIN rules r ON lower(trim(s.data_source)) = r.r_ds
             AND lower(trim(s.diagnosis)) = r.r_diag
             AND lower(trim(s.primary_site)) = r.r_site
             AND lower(trim(s.tumour_type)) = r.r_tt
           LEFT JOIN onto o ON r.mapped_term_id = o.term_id),
         datasets AS (
           SELECT b.sample_id, b.data_source,
             list_sort(list_distinct(list(
               coalesce(pl.molecular_characterisation_type, 'unknown')))) AS ds_list
           FROM (SELECT DISTINCT * FROM raw_mcs) b
           LEFT JOIN (SELECT DISTINCT platform_id, data_source,
                        molecular_characterisation_type FROM raw_mcp) pl
             USING (platform_id, data_source)
           GROUP BY b.sample_id, b.data_source),
         model AS (
           SELECT m.model_id, m.data_source, m.sample_type AS model_type,
             sh.license AS license_name, sh.model_availability, sh.date_submitted
           FROM (SELECT DISTINCT model_id, data_source, sample_type FROM raw_model) m
           LEFT JOIN (SELECT DISTINCT model_id, data_source, license,
                        model_availability, date_submitted FROM raw_sharing) sh
             USING (model_id, data_source)),
         license_dim(license_name, license_url) AS (VALUES
           ('EMBL-EBI', 'https://www.ebi.ac.uk/about/terms-of-use'),
           ('CC0', 'https://creativecommons.org/publicdomain/zero/1.0/')),
         enriched AS (
           SELECT s.*, p.sex, p.history, p.ethnicity, p.age_at_initial_diagnosis,
             t.term_name, t.ancestors, d.ds_list, m.model_type, m.license_name,
             m.model_availability, m.date_submitted, rs.provider_name, rs.project,
             CASE WHEN t.term_name IS NULL THEN []::VARCHAR[]
               ELSE list_filter(
                 list_filter(t.display_list,
                   (x, i) -> list_position(t.display_list, x) = i),
                 x -> NOT list_contains(
                   ['Cancer', 'Cancer by Special Category', 'Cancer by Morphology',
                    'Cancer by Site'], x))
               END AS search_terms_list
           FROM raw_sample s
           LEFT JOIN raw_patient p USING (patient_id, data_source)
           LEFT JOIN s2o t USING (sample_id, data_source)
           LEFT JOIN datasets d USING (sample_id, data_source)
           LEFT JOIN model m USING (model_id, data_source)
           LEFT JOIN raw_source rs USING (data_source))
         SELECT
           e.model_id AS external_model_id,
           e.data_source,
           e.patient_id,
           lower(trim(replace(e.sex, chr(160), ' '))) AS patient_sex,
           e.history AS patient_history,
           CASE WHEN e.ethnicity IS NULL
               OR lower(trim(replace(e.ethnicity, chr(160), ' ')))
                 IN ('not provided', 'not collected', '') THEN NULL
             ELSE e.ethnicity END AS patient_ethnicity,
           e.age_at_initial_diagnosis AS patient_age_at_initial_diagnosis,
           CASE WHEN TRY_CAST(trim(replace(e.age_at_initial_diagnosis, chr(160), ' ')) AS DOUBLE) IS NULL THEN NULL
             WHEN TRY_CAST(trim(replace(e.age_at_initial_diagnosis, chr(160), ' ')) AS DOUBLE) < 2 THEN '0 - 23 months'
             WHEN TRY_CAST(trim(replace(e.age_at_initial_diagnosis, chr(160), ' ')) AS DOUBLE) < 10 THEN '2 - 9'
             ELSE concat(
               CAST(CAST(floor(TRY_CAST(trim(replace(e.age_at_initial_diagnosis, chr(160), ' ')) AS DOUBLE) / 10) * 10 AS INTEGER) AS VARCHAR),
               ' - ',
               CAST(CAST(floor(TRY_CAST(trim(replace(e.age_at_initial_diagnosis, chr(160), ' ')) AS DOUBLE) / 10) * 10 + 9 AS INTEGER) AS VARCHAR))
             END AS patient_age_category,
           CASE WHEN TRY_CAST(trim(replace(e.age_in_years_at_collection, chr(160), ' ')) AS DOUBLE) IS NULL THEN NULL
             WHEN TRY_CAST(trim(replace(e.age_in_years_at_collection, chr(160), ' ')) AS DOUBLE) < 2 THEN '0 - 23 months'
             WHEN TRY_CAST(trim(replace(e.age_in_years_at_collection, chr(160), ' ')) AS DOUBLE) < 10 THEN '2 - 9'
             ELSE concat(
               CAST(CAST(floor(TRY_CAST(trim(replace(e.age_in_years_at_collection, chr(160), ' ')) AS DOUBLE) / 10) * 10 AS INTEGER) AS VARCHAR),
               ' - ',
               CAST(CAST(floor(TRY_CAST(trim(replace(e.age_in_years_at_collection, chr(160), ' ')) AS DOUBLE) / 10) * 10 + 9 AS INTEGER) AS VARCHAR))
             END AS patient_age,
           e.sample_id AS patient_sample_id,
           CASE WHEN e.primary_site IS NULL
               OR lower(trim(replace(e.primary_site, chr(160), ' ')))
                 IN ('not provided', 'not collected', '') THEN NULL
             ELSE trim(replace(e.primary_site, chr(160), ' ')) END AS primary_site,
           e.collection_site,
           CASE WHEN e.tumour_type IS NULL
               OR lower(trim(replace(e.tumour_type, chr(160), ' ')))
                 IN ('not provided', 'not collected', '') THEN NULL
             ELSE trim(replace(e.tumour_type, chr(160), ' ')) END AS tumour_type,
           e.stage AS cancer_stage,
           e.grade AS cancer_grade,
           trim(regexp_replace(
             CASE WHEN contains(coalesce(e.term_name, e.diagnosis), 'Malignant')
               THEN regexp_replace(coalesce(e.term_name, e.diagnosis),
                 '(.*)Malignant(.*)Neoplasm(.*)', '\1\2Cancer\3')
               ELSE regexp_replace(coalesce(e.term_name, e.diagnosis),
                 '(.*)Neoplasm(.*)', '\1Cancer\2') END,
             '\s+', ' ', 'g')) AS histology,
           coalesce(array_to_string(e.search_terms_list, '|'), '') AS search_terms,
           coalesce(
             list_filter(
               ['Breast Cancer', 'Cardiovascular Cancer',
                'Connective and Soft Tissue Cancer', 'Digestive System Cancer',
                'Endocrine Cancer', 'Eye Cancer', 'Head and Neck Cancer',
                'Hematopoietic and Lymphoid System Cancer', 'Nervous System Cancer',
                'Peritoneal and Retroperitoneal Cancer', 'Reproductive System Cancer',
                'Respiratory Tract Cancer', 'Thoracic Cancer', 'Skin Cancer',
                'Urinary System Cancer', 'Unclassified'],
               x -> list_contains(e.search_terms_list, x))[1],
             'Unclassified') AS cancer_system,
           coalesce(array_to_string(e.ds_list, '|'), '') AS dataset_available,
           CAST(trunc(coalesce(len(e.ds_list), 0) * 100 / 3.0) AS INTEGER) AS data_score,
           CAST(floor((
             (CASE WHEN e.diagnosis IS NOT NULL
                 AND lower(trim(replace(e.diagnosis, chr(160), ' ')))
                   NOT IN ('not provided', 'not collected', '') THEN 4 ELSE 0 END) +
             (CASE WHEN e.sex IS NOT NULL
                 AND lower(trim(replace(e.sex, chr(160), ' ')))
                   NOT IN ('not provided', 'not collected', '') THEN 2 ELSE 0 END) +
             (CASE WHEN e.primary_site IS NOT NULL
                 AND lower(trim(replace(e.primary_site, chr(160), ' ')))
                   NOT IN ('not provided', 'not collected', '') THEN 2 ELSE 0 END) +
             (CASE WHEN e.tumour_type IS NOT NULL
                 AND lower(trim(replace(e.tumour_type, chr(160), ' ')))
                   NOT IN ('not provided', 'not collected', '') THEN 2 ELSE 0 END)
             ) * 100.0 / 10) AS INTEGER) AS metadata_score,
           trim(replace(e.provider_name, chr(160), ' ')) AS provider_name,
           CASE WHEN e.project IS NULL
               OR lower(trim(replace(e.project, chr(160), ' ')))
                 IN ('not provided', 'not collected', '') THEN NULL
             ELSE trim(replace(e.project, chr(160), ' ')) END AS project_name,
           e.license_name,
           ld.license_url,
           e.model_type,
           e.model_availability,
           e.date_submitted,
           CASE WHEN tb.model_treatments IS NULL THEN NULL
             ELSE coalesce(array_to_string(tb.model_treatments, '|'), '') END
             AS model_treatments,
           CASE WHEN tb.model_treatments_responses IS NULL THEN NULL
             ELSE coalesce(array_to_string(tb.model_treatments_responses, '|'), '') END
             AS model_treatments_responses,
           CASE WHEN tb.patient_treatments IS NULL THEN NULL
             ELSE coalesce(array_to_string(tb.patient_treatments, '|'), '') END
             AS patient_treatments,
           CASE WHEN tb.patient_treatments_responses IS NULL THEN NULL
             ELSE coalesce(array_to_string(tb.patient_treatments_responses, '|'), '') END
             AS patient_treatments_responses,
           CASE WHEN tb.treatment_types IS NULL THEN NULL
             ELSE coalesce(array_to_string(tb.treatment_types, '|'), '') END
             AS custom_treatment_type_list
         FROM enriched e
         LEFT JOIN license_dim ld ON e.license_name = ld.license_name
         LEFT JOIN tbm tb ON e.model_id = tb.model_id
           AND e.data_source = tb.data_source""",
    // ExactSubstr removal: canonical occurrence via min(struct) (DuckDB
    // orders structs lexicographically like Spark); the kept text is
    // rebuilt char-by-char with a running max over covered span starts
    // (the engine merges spans in a per-doc fold instead — same result).
    "q118_dedup_spans" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 20),
         occ AS (SELECT doc_id, CAST(g AS INTEGER) AS pos,
             substr(text, CAST(g AS INTEGER), 20) AS gram
           FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text) - 19)) AS g
                 FROM d)),
         canon AS (SELECT gram, min({'doc_id': doc_id, 'pos': pos}) AS c
           FROM occ GROUP BY gram),
         covered AS (SELECT o.doc_id, o.pos
           FROM occ o JOIN canon cn ON o.gram = cn.gram
           WHERE {'doc_id': o.doc_id, 'pos': o.pos} != cn.c),
         chars AS (SELECT doc_id, text, CAST(cp AS INTEGER) AS cpos
           FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text))) AS cp
                 FROM d)),
         marked AS (SELECT c.doc_id, c.text, c.cpos,
             max(cv.pos) OVER (PARTITION BY c.doc_id ORDER BY c.cpos) AS last_start
           FROM chars c LEFT JOIN covered cv
             ON c.doc_id = cv.doc_id AND c.cpos = cv.pos)
         SELECT doc_id,
           coalesce(string_agg(substr(text, cpos, 1), '' ORDER BY cpos)
             FILTER (WHERE last_start IS NULL OR cpos >= last_start + 20), '')
             AS cleaned_text,
           CAST(count(*) FILTER (WHERE last_start IS NOT NULL
             AND cpos < last_start + 20) AS BIGINT) AS removed_chars
         FROM marked GROUP BY doc_id
         UNION ALL
         SELECT doc_id, text AS cleaned_text, CAST(0 AS BIGINT) AS removed_chars
         FROM documents WHERE length(text) < 20""",
    "q94_dup_spans" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 20),
         pos AS (SELECT doc_id, text,
             unnest(generate_series(1, length(text) - 19)) AS g FROM d),
         grams AS (SELECT doc_id, substr(text, CAST(g AS INTEGER), 20) AS gram
           FROM pos),
         dup AS (SELECT gram FROM grams
           GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
         per AS (SELECT g.doc_id, count(*) AS dup_positions
           FROM grams g JOIN dup USING (gram) GROUP BY 1)
         SELECT d.doc_id, CAST(length(d.text) - 19 AS BIGINT) AS total_grams,
                CAST(coalesce(p.dup_positions, 0) AS BIGINT) AS dup_positions
         FROM d LEFT JOIN per p USING (doc_id)""",
    "q97_zorder_box" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(DISTINCT user_id) AS n_users
         FROM events
         WHERE user_id >= 10 AND user_id <= 40
           AND value >= 20.0 AND value <= 60.0
         GROUP BY 1""",
    "q93_manifest_scan" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(DISTINCT user_id) AS n_users
         FROM events WHERE value >= 10.0 AND value <= 20.0
         GROUP BY 1""",
    "q107_decile_bins" ->
      """WITH b AS (
           SELECT quantile_cont(o_totalprice,
             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
           FROM orders),
         t AS (
           SELECT o_totalprice,
             1 + (SELECT count(*) FROM unnest((SELECT qs FROM b)) AS u(q)
                  WHERE o_totalprice > q) AS decile
           FROM orders)
         SELECT CAST(decile AS INT) AS decile, count(*) AS n,
                min(o_totalprice) AS min_price,
                max(o_totalprice) AS max_price
         FROM t GROUP BY decile""",
    "q106_transitions" ->
      """WITH t AS (
           SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events)
         SELECT event_type, next_type, count(*) AS n
         FROM t WHERE next_type IS NOT NULL
         GROUP BY 1, 2""",
    "q104_funnel" ->
      """WITH f AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
           FROM events GROUP BY user_id)
         SELECT CASE
             WHEN first_view IS NULL THEN 'no_view'
             WHEN first_click IS NULL OR first_click <= first_view THEN 'view'
             WHEN first_purchase IS NULL OR first_purchase <= first_click
               THEN 'view_click'
             ELSE 'view_click_purchase' END AS stage,
           count(*) AS n_users
         FROM f GROUP BY 1""",
    "q105_cohorts" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
         SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
                datediff('day', c.cohort_day, e.day) AS day_offset,
                count(DISTINCT e.user_id) AS n_active
         FROM e JOIN c USING (user_id)
         WHERE datediff('day', c.cohort_day, e.day) <= 7
         GROUP BY 1, 2""",
    "q103_time_travel" ->
      """SELECT 'v1' AS snapshot, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events WHERE event_id % 2 = 0
         UNION ALL
         SELECT 'v2', count(*),
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         FROM events
         UNION ALL
         SELECT 'delta', count(*),
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         FROM events WHERE event_id % 2 = 1""",
    "q102_bloom_point_scan" ->
      """SELECT user_id, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events WHERE user_id IN (3, 77, 142)
         GROUP BY user_id""",
    "q111_sliding_distinct" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, event_type,
                  list(DISTINCT user_id) AS users
           FROM events GROUP BY 1, 2)
         SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
           len(users) AS n_today,
           len(list_distinct(flatten(list(users) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)))) AS n_trailing_3d
         FROM daily""",
    "q110_stratum_topk" ->
      """WITH h AS (SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang ORDER BY
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
               / 4294967296.0, doc_id) AS rn
           FROM documents)
         SELECT doc_id, lang FROM h WHERE rn <= 20""",
    "q101_quarantine" ->
      """SELECT event_id,
         concat_ws(',',
           CASE WHEN value > 95.0 THEN 'extreme_value' END,
           CASE WHEN user_id >= 140 THEN 'suspect_user' END,
           CASE WHEN event_type IS NULL THEN 'null_type' END) AS violations
         FROM events
         WHERE value > 95.0 OR user_id >= 140 OR event_type IS NULL""",
    "q100_corpus_mix" ->
      """WITH d AS (SELECT doc_id, lang,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             / 4294967296.0 AS frac
           FROM documents WHERE lang IN ('en', 'de', 'fr')),
         w(lang, wt) AS (VALUES ('en', CAST(0.5 AS DOUBLE)),
           ('de', CAST(0.3 AS DOUBLE)), ('fr', CAST(0.2 AS DOUBLE))),
         tot AS (SELECT lang, sum(n_tokens) AS t FROM d GROUP BY lang),
         sc AS (SELECT min(CAST(t AS DOUBLE) / wt) AS s FROM tot JOIN w USING (lang)),
         r AS (SELECT lang, (SELECT s FROM sc) * wt / CAST(t AS DOUBLE) AS rate
           FROM tot JOIN w USING (lang))
         SELECT d.lang, count(*) AS n_docs,
                CAST(sum(d.n_tokens) AS BIGINT) AS n_tokens
         FROM d JOIN r ON d.lang = r.lang AND d.frac < r.rate
         GROUP BY d.lang""",
    "q99_sliding_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents),
         s AS (SELECT doc_id, toks,
             unnest(generate_series(0, greatest(len(toks) - 1, 0), 30)) AS st
           FROM t)
         SELECT doc_id, CAST(st // 30 AS INT) AS chunk_idx,
                CAST(least(40, len(toks) - st) AS INT) AS n_chunk_tokens,
                array_to_string(toks[st + 1 : st + 40], ' ') AS chunk_text
         FROM s""",
    "q98_inverted_index" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
           FROM documents),
         p AS (
           SELECT term, count(DISTINCT doc_id) AS df,
                  list_sort(list(DISTINCT doc_id)) AS docs
           FROM toks WHERE term <> '' GROUP BY term)
         SELECT term, df, to_json(docs[1:20]) AS postings
         FROM p WHERE df >= 50""",
    "q92_count_min" ->
      """WITH params(i, a, b) AS (VALUES
           (0, 1103515245, 12345), (1, 1229782938, 1013904223),
           (2, 1103581, 7919), (3, 48271, 11)),
         counters AS (
           SELECT p.i, ((p.a * e.user_id + p.b) % 2147483647) % 64 AS bucket,
                  count(*) AS c
           FROM events e CROSS JOIN params p GROUP BY 1, 2),
         keys AS (SELECT range AS user_id FROM range(0, 10)),
         est AS (
           SELECT k.user_id, min(coalesce(c.c, 0)) AS cm_est
           FROM keys k CROSS JOIN params p
           LEFT JOIN counters c
             ON c.i = p.i AND c.bucket = ((p.a * k.user_id + p.b) % 2147483647) % 64
           GROUP BY 1),
         truth AS (SELECT user_id, count(*) AS true_cnt FROM events GROUP BY 1)
         SELECT e.user_id, CAST(coalesce(t.true_cnt, 0) AS BIGINT) AS true_cnt,
                CAST(e.cm_est AS BIGINT) AS cm_est
         FROM est e LEFT JOIN truth t USING (user_id)""",
    "q86_pii_redaction" ->
      """WITH t AS (SELECT c_custkey,
           c_name || ' <user' || CAST(c_custkey AS VARCHAR) || '@example.com>' ||
           CASE WHEN c_custkey % 3 = 0
             THEN ' tel 555-' || lpad(CAST(c_custkey AS VARCHAR), 7, '0')
             ELSE '' END ||
           CASE WHEN c_custkey % 5 = 0
             THEN ' ip 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.7'
             ELSE '' END AS text
           FROM customer)
         SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '([0-9]{1,3}\.){3}[0-9]{1,3}', '[IP]', 'g'),
             '[0-9][0-9-]{6,}[0-9]', '[PHONE]', 'g') AS redacted,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, '[0-9][0-9-]{6,}[0-9]')) AS n_phones,
           len(regexp_extract_all(text,
             '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ips
         FROM t""",
    "q87_salient_terms" ->
      """WITH toks AS (SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (SELECT doc_id, term,
             CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS score
           FROM tf JOIN df USING (term) CROSS JOIN n),
         m AS (SELECT doc_id, min({'neg': -score, 'term': term}) AS ms
           FROM scored GROUP BY doc_id)
         SELECT doc_id, struct_extract(ms, 'term') AS top_term,
           -struct_extract(ms, 'neg') AS tfidf
         FROM m""",
    "q38_embed_topk" ->
      s"""WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings)
         SELECT vec_id, round($cosineSqlBody, 4) AS cosine_sim
         FROM e, q ORDER BY cosine_sim DESC, vec_id LIMIT 10""",
    "q88_rerank" ->
      s"""WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
         cand AS (SELECT vec_id, $cosineSqlBody AS s1
           FROM e, q ORDER BY s1 DESC, vec_id LIMIT 50),
         rr AS (SELECT vec_id, s1,
             0.9 * s1 + 0.1 * (CAST(CAST(concat('0x', substr(md5(
               concat('0|', CAST(vec_id AS VARCHAR))), 1, 8)) AS BIGINT) AS DOUBLE)
               / 4294967296.0) AS s2
           FROM cand)
         SELECT vec_id, round(s1, 4) AS cosine_sim, round(s2, 4) AS rerank_score
         FROM rr ORDER BY s2 DESC, vec_id LIMIT 10""",
    "q84_int8_ann" ->
      """WITH q0 AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
         q1 AS (SELECT qv,
             list_max(list_transform(qv, x -> abs(x))) / 127.0 AS qscale FROM q0),
         q AS (SELECT qscale, CASE WHEN qscale > 0
             THEN list_transform(qv, x -> CAST(round(x / qscale) AS BIGINT))
             ELSE list_transform(qv, x -> CAST(0 AS BIGINT)) END AS qcodes FROM q1),
         e0 AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
         e1 AS (SELECT vec_id, ev,
             list_max(list_transform(ev, x -> abs(x))) / 127.0 AS vscale FROM e0),
         e AS (SELECT vec_id, vscale, CASE WHEN vscale > 0
             THEN list_transform(ev, x -> CAST(round(x / vscale) AS BIGINT))
             ELSE list_transform(ev, x -> CAST(0 AS BIGINT)) END AS codes FROM e1),
         s AS (SELECT vec_id, vscale, qscale,
             CAST(list_sum(list_transform(range(1, len(codes)+1),
               i -> codes[i] * qcodes[i])) AS BIGINT) AS q_dot
           FROM e, q)
         SELECT vec_id, q_dot,
           round(vscale * qscale * CAST(q_dot AS DOUBLE), 4) AS approx_dot
         FROM s
         ORDER BY vscale * qscale * CAST(q_dot AS DOUBLE) DESC, vec_id LIMIT 10""",
    "q40_near_pairs_demo" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings WHERE vec_id < 300)
         SELECT id_a, id_b, cosine_sim FROM (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
             / (sqrt(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*a.v[i])))
              * sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i]*b.v[i])))), 4) AS cosine_sim
           FROM e a JOIN e b ON a.vec_id < b.vec_id)
         WHERE cosine_sim >= 0.35""",
    "q41_label_stats" ->
      """SELECT label, count(*) AS n, min(len(embedding)) AS min_dim,
         max(len(embedding)) AS max_dim FROM embeddings GROUP BY label""",
    "q39_lsh_ann" -> lshAnnSql,
    "q66_bucketed_near_pairs" -> bucketedNearPairsSql,
    "q108_triangles" -> trianglesSql,
    "q109_jaccard_join" ->
      """WITH toks AS (SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
         t AS (SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> array_to_string(w[i:i+2], ' '))) AS s
           FROM toks WHERE len(w) >= 3),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
             CAST(len(a.s) AS BIGINT) + CAST(len(b.s) AS BIGINT) AS nsum
           FROM t a JOIN t b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, inter, nsum - inter AS uni
         FROM p WHERE inter * 9 >= nsum * 4""",
    "q67_ivf_search" -> ivfSearchSql,
    "q122_semantic_dedup" -> semanticDedupSql,
    "q123_bm25" -> bm25Sql,
    "q124_dedup_survivors" -> dedupSurvivorsSql,
    "q136_dedup_apply" -> dedupApplySql,
    "q137_sentence_dedup" ->
      """WITH sent AS (SELECT doc_id,
             unnest(regexp_split_to_array(text, '\. ')) AS sent,
             generate_subscripts(regexp_split_to_array(text, '\. '), 1) - 1 AS pos
           FROM documents),
         canon AS (SELECT sent, min({'d': doc_id, 'p': pos}) AS c
           FROM sent GROUP BY sent),
         k AS (SELECT doc_id, pos, sent.sent,
             CASE WHEN struct_extract(c, 'd') = doc_id
                   AND struct_extract(c, 'p') = pos THEN 1 ELSE 0 END AS kept
           FROM sent JOIN canon USING (sent))
         SELECT doc_id, count(*) AS n_sents,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           array_to_string(list(sent ORDER BY pos) FILTER (WHERE kept = 1), '. ')
             AS text_deduped
         FROM k GROUP BY doc_id""",
    "q125_perplexity_filter" -> perplexityFilterSql,
    "q126_pmi_collocations" -> pmiCollocationsSql,
    "q127_kl_drift" -> klDriftSql,
    "q128_vocab_coverage" -> vocabCoverageSql,
    "q129_ngram_novelty" -> ngramNoveltySql,
    "q130_hash_split" -> hashSplitSql,
    "q131_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         c AS (SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS non_ws,
             CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS n_hash,
             CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3.0 AS n_ell,
             CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) AS n_alpha,
             CAST(list_contains(w, 'the') AS INT) + CAST(list_contains(w, 'be') AS INT)
           + CAST(list_contains(w, 'to') AS INT) + CAST(list_contains(w, 'of') AS INT)
           + CAST(list_contains(w, 'and') AS INT) + CAST(list_contains(w, 'that') AS INT)
           + CAST(list_contains(w, 'have') AS INT) + CAST(list_contains(w, 'with') AS INT)
             AS stop_hits
           FROM t)
         SELECT doc_id, n_words,
           round(non_ws / n_words, 4) AS mean_word_len,
           round((n_hash + n_ell) / n_words, 4) AS symbol_ratio,
           round(n_alpha / n_words, 4) AS alpha_ratio,
           stop_hits,
           (n_words BETWEEN 25 AND 100000) AND (non_ws / n_words BETWEEN 3.0 AND 10.0)
             AND ((n_hash + n_ell) / n_words <= 0.1) AND (n_alpha / n_words >= 0.8)
             AND stop_hits >= 2 AS keep
         FROM c""",
    "q132_c4_filters" ->
      """WITH t AS (SELECT doc_id, text, lower(text) AS lt,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words
           FROM documents),
         c AS (SELECT doc_id, n_words,
             CAST(length(text) - length(replace(text, '.', '')) AS BIGINT)
           + CAST(length(text) - length(replace(text, '!', '')) AS BIGINT)
           + CAST(length(text) - length(replace(text, '?', '')) AS BIGINT) AS n_terminal,
             contains(text, '{') AS has_brace,
             contains(lt, 'lorem ipsum') AS has_lorem,
             contains(lt, 'javascript') AS has_javascript
           FROM t)
         SELECT doc_id, n_words, n_terminal, has_brace, has_lorem, has_javascript,
           NOT has_brace AND NOT has_lorem AND n_terminal >= 3 AND n_words >= 5 AS keep
         FROM c""",
    "q133_dsir_weights" ->
      """WITH pos AS (SELECT doc_id, lang,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term,
             generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1 AS pos
           FROM documents),
         tgt AS (SELECT term, count(*) AS tcnt FROM pos WHERE lang = 'en' GROUP BY 1),
         raw AS (SELECT term, count(*) AS rcnt FROM pos WHERE lang <> 'en' GROUP BY 1),
         tot AS (SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ttot,
             CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS rtot,
             CAST(count(DISTINCT term) AS BIGINT) AS v FROM pos),
         lt AS (SELECT vt.term,
             round(ln(((COALESCE(tcnt, 0) + 1) / CAST(ttot + v AS DOUBLE)) /
                      ((COALESCE(rcnt, 0) + 1) / CAST(rtot + v AS DOUBLE))), 6) AS lt
           FROM (SELECT DISTINCT term FROM pos) vt
           LEFT JOIN tgt USING (term) LEFT JOIN raw USING (term) CROSS JOIN tot),
         sc AS (SELECT doc_id, count(*) AS n_tokens,
             list_sum(list(lt ORDER BY pos)) AS lr
           FROM pos JOIN lt USING (term) GROUP BY doc_id)
         SELECT doc_id, n_tokens, round(lr, 4) AS log_ratio, lr > 0 AS keep FROM sc""",
    "q134_mix_temperature" ->
      """WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
           FROM (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
                 FROM documents)
           GROUP BY source),
         sw AS (SELECT source, n_tokens, round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS sw
           FROM st),
         tot AS (SELECT list_sum(list(sw ORDER BY source)) AS tot FROM sw)
         SELECT source, n_tokens, round(sw / tot, 6) AS weight,
           round(sw / tot * 1000000.0 / n_tokens, 4) AS expected_epochs
         FROM sw CROSS JOIN tot""",
    "q135_token_shards" ->
      """WITH t AS (SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
             CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           FROM t)
         SELECT doc_id, source, n_tokens,
           CAST(cum_before // 2000 AS BIGINT) AS shard_id,
           CAST(cum_before % 2000 AS BIGINT) AS shard_offset
         FROM c""",
    "q138_decontaminate" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         sh AS (SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(w)-1),
               i -> array_to_string(w[i:i+2], ' ')))) AS shingle
           FROM toks WHERE len(w) >= 3),
         ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 50),
         tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 50),
         rare AS (SELECT shingle FROM tr GROUP BY shingle
           HAVING count(DISTINCT doc_id) <= 64),
         shared AS (SELECT tr.doc_id, count(DISTINCT tr.shingle) AS n
           FROM tr JOIN rare USING (shingle) JOIN ev USING (shingle)
           GROUP BY tr.doc_id)
         SELECT d.doc_id,
           CAST(COALESCE(shared.n, 0) AS BIGINT) AS n_shared_shingles,
           COALESCE(shared.n, 0) > 0 AS contaminated
         FROM documents d LEFT JOIN shared ON d.doc_id = shared.doc_id
         WHERE d.doc_id >= 50""",
    "q139_budget_alloc" -> budgetAllocSql,
    "q142_quality_quantile" ->
      s"""WITH qq AS (SELECT doc_id, source, quality_score AS quality
           FROM ($qualityWithSourceSql)),
         thr AS (SELECT source, quantile_cont(quality, 0.75) AS p75
           FROM qq GROUP BY source)
         SELECT doc_id, source, quality, p75
         FROM qq JOIN thr USING (source)
         WHERE quality >= p75""",
    "q146_mad_outliers" ->
      s"""WITH qq AS (SELECT doc_id, source, quality_score AS quality
           FROM ($qualityWithSourceSql)),
         med AS (SELECT source, quantile_cont(quality, 0.5) AS med
           FROM qq GROUP BY source),
         dv AS (SELECT doc_id, qq.source, quality, med,
             abs(quality - med) AS dev
           FROM qq JOIN med USING (source)),
         mad AS (SELECT source, quantile_cont(dev, 0.5) AS mad
           FROM dv GROUP BY source)
         SELECT doc_id, dv.source, round(quality, 6) AS quality,
           round(med, 6) AS med, round(dev, 6) AS dev,
           dev > 3.0 * mad AS is_outlier
         FROM dv JOIN mad USING (source)""",
    "q147_knn_label_agreement" ->
      s"""WITH ${bucketedPairCtes(4, 0.3)},
         sym AS (SELECT id_a AS v, id_b AS nb, cos FROM pairs
                 UNION ALL SELECT id_b AS v, id_a AS nb, cos FROM pairs),
         nn AS (SELECT v, struct_extract(min({'nc': -cos, 'nb': nb}), 'nb') AS nb
                FROM sym GROUP BY v),
         nnl AS (SELECT a.label AS label, b.label AS nb_label
                 FROM nn JOIN embeddings a ON a.vec_id = nn.v
                         JOIN embeddings b ON b.vec_id = nn.nb),
         agg AS (SELECT label, CAST(count(*) AS BIGINT) AS n_matched,
                   CAST(sum(CASE WHEN label = nb_label THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_agree
                 FROM nnl GROUP BY label),
         tot AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vectors
                 FROM embeddings GROUP BY label)
         SELECT t.label, n_vectors,
           coalesce(n_matched, 0) AS n_matched,
           coalesce(n_agree, 0) AS n_agree,
           CASE WHEN coalesce(n_matched, 0) = 0 THEN CAST(NULL AS DOUBLE)
                ELSE round(CAST(n_agree AS DOUBLE) / n_matched, 6)
           END AS agree_rate
         FROM tot t LEFT JOIN agg USING (label)""",
    "q148_hard_negatives" ->
      s"""WITH ${bucketedPairCtes(4, 0.3)},
         sym AS (SELECT id_a AS v, id_b AS nb, cos FROM pairs
                 UNION ALL SELECT id_b AS v, id_a AS nb, cos FROM pairs),
         crossp AS (SELECT v, nb, a.label AS label, b.label AS nb_label, cos
                 FROM sym JOIN embeddings a ON a.vec_id = sym.v
                          JOIN embeddings b ON b.vec_id = sym.nb
                 WHERE a.label <> b.label),
         rk AS (SELECT v, nb, label, nb_label, cos,
                  row_number() OVER (PARTITION BY v
                    ORDER BY cos DESC, nb) AS rn
                FROM crossp)
         SELECT v, nb, label, nb_label, round(cos, 6) AS cos
         FROM rk WHERE rn <= 2""",
    "q149_label_centroids" ->
      """WITH ev AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         ei AS (SELECT vec_id, label, v,
             unnest(range(1, len(v)+1)) AS i FROM ev),
         ed AS (SELECT vec_id, label, i - 1 AS dim, v[i] AS x FROM ei),
         cent AS (SELECT label, dim,
             list_sum(list(x ORDER BY vec_id)) / count(*) AS c
           FROM ed GROUP BY label, dim),
         cv AS (SELECT label, list(c ORDER BY dim) AS cv
                FROM cent GROUP BY label)
         SELECT a.label AS label_a, b.label AS label_b,
           round(list_sum(list_transform(range(1, len(a.cv)+1),
               i -> a.cv[i]*b.cv[i]))
             / (sqrt(list_sum(list_transform(range(1, len(a.cv)+1),
                 i -> a.cv[i]*a.cv[i])))
                * sqrt(list_sum(list_transform(range(1, len(b.cv)+1),
                 i -> b.cv[i]*b.cv[i])))), 6) AS centroid_cos
         FROM cv a JOIN cv b ON a.label < b.label""",
    "q150_padding_efficiency" ->
      """WITH toks AS (SELECT source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tok
           FROM documents),
         ex AS (SELECT source, n_tok,
             unnest([128, 512, 2048]) AS seq_len FROM toks),
         ag AS (SELECT source, seq_len,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(sum(least(n_tok, seq_len)) AS BIGINT) AS kept_tokens,
             CAST(sum(greatest(n_tok - seq_len, 0)) AS BIGINT)
               AS truncated_tokens
           FROM ex GROUP BY source, seq_len)
         SELECT source, CAST(seq_len AS INTEGER) AS seq_len, n_docs,
           n_tokens, kept_tokens, truncated_tokens,
           CAST(n_docs * seq_len - kept_tokens AS BIGINT) AS pad_waste,
           CAST(floor((kept_tokens + seq_len - 1) / seq_len) AS BIGINT)
             AS packed_rows,
           round(CAST(kept_tokens AS DOUBLE) /
             (floor((kept_tokens + seq_len - 1) / seq_len) * seq_len), 6)
             AS pack_efficiency
         FROM ag""",
    "q151_lexical_diversity" ->
      """WITH w AS (SELECT source,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT source, term, count(*) AS cnt FROM w
                GROUP BY source, term),
         ag AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
           FROM tf GROUP BY source)
         SELECT source, n_tokens, n_types, n_hapax,
           round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
           round(CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_frac
         FROM ag""",
    "q152_cluster_sizes" ->
      s"""WITH RECURSIVE ${bucketedPairCtes(4, 0.3)},
         edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM edges
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         cc AS (SELECT a AS vertex, least(a, min(b)) AS component
                FROM reach GROUP BY a),
         cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
                FROM cc GROUP BY component)
         SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_vectors
         FROM cs GROUP BY cluster_size""",
    "q153_zipf_head" ->
      """WITH tc AS (SELECT term, count(*) AS cnt
           FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                   AS term FROM documents)
           GROUP BY term),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM tc),
         top AS (SELECT term, cnt FROM tc ORDER BY cnt DESC, term LIMIT 50),
         r AS (SELECT term, CAST(cnt AS BIGINT) AS cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, term) AS INTEGER)
               AS rank,
             CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM top)
         SELECT rank, term, cnt,
           round(CAST(cum AS DOUBLE) / total, 6) AS cum_frac
         FROM r, tot""",
    "q154_quality_length_corr" ->
      s"""WITH qq AS (SELECT doc_id, source, quality_score
           FROM ($qualityWithSourceSql)),
         base AS (SELECT d.doc_id, qq.source,
             CAST(d.n_chars AS DOUBLE) AS x, quality_score AS y
           FROM documents d JOIN qq ON qq.doc_id = d.doc_id),
         m AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
             list_sum(list(x ORDER BY doc_id)) AS sx,
             list_sum(list(y ORDER BY doc_id)) AS sy,
             list_sum(list(x*y ORDER BY doc_id)) AS sxy,
             list_sum(list(x*x ORDER BY doc_id)) AS sx2,
             list_sum(list(y*y ORDER BY doc_id)) AS sy2
           FROM base GROUP BY source)
         SELECT source, CAST(n AS BIGINT) AS n_docs,
           CASE WHEN (n*sx2 - sx*sx) * (n*sy2 - sy*sy) <= 0
                THEN CAST(NULL AS DOUBLE)
                ELSE round((n*sxy - sx*sy) /
                  (sqrt(n*sx2 - sx*sx) * sqrt(n*sy2 - sy*sy)), 6)
           END AS corr_len_quality
         FROM m""",
    "q157_length_debias" ->
      s"""WITH qq AS (SELECT doc_id, source, quality_score
           FROM ($qualityWithSourceSql)),
         base AS (SELECT d.doc_id, qq.source,
             CAST(d.n_chars AS DOUBLE) AS x, quality_score AS y
           FROM documents d JOIN qq ON qq.doc_id = d.doc_id),
         m AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
             list_sum(list(x ORDER BY doc_id)) AS sx,
             list_sum(list(y ORDER BY doc_id)) AS sy,
             list_sum(list(x*y ORDER BY doc_id)) AS sxy,
             list_sum(list(x*x ORDER BY doc_id)) AS sx2
           FROM base GROUP BY source),
         ab AS (SELECT source, n, sx, sy,
             CASE WHEN n*sx2 - sx*sx = 0 THEN CAST(NULL AS DOUBLE)
                  ELSE (n*sxy - sx*sy) / (n*sx2 - sx*sx) END AS b
           FROM m),
         ab2 AS (SELECT source, b, (sy - b*sx) / n AS a FROM ab)
         SELECT base.doc_id, base.source,
           round(y, 6) AS quality,
           round(y - (a + b*x), 6) AS debiased_quality
         FROM base JOIN ab2 USING (source)""",
    "q158_bpe_pair_stats" ->
      """WITH toks AS (
           SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
           FROM documents),
         words AS (SELECT word, count(*) AS freq
           FROM toks WHERE word <> '' GROUP BY 1),
         syms AS (SELECT freq,
             list_append(string_split(word, ''), '</w>') AS symbols
           FROM words),
         pairs AS (SELECT symbols[i] AS a, symbols[i+1] AS b, freq
           FROM syms, UNNEST(range(1, len(symbols))) AS t(i))
         SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count
         FROM pairs GROUP BY 1, 2
         ORDER BY pair_count DESC, a, b LIMIT 20""",
    "q159_gram_matrix" ->
      """WITH flat AS (
           SELECT vec_id, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, UNNEST(range(1, len(embedding)+1)) AS t(i))
         SELECT a.i AS i, b.i AS j, round(sum(a.x * b.x), 4) AS gram
         FROM flat a JOIN flat b USING (vec_id) WHERE a.i <= b.i
         GROUP BY 1, 2""",
    "q160_scd2_dimension" ->
      """WITH snap AS (SELECT c_custkey, c_acctbal FROM customer),
         upd AS (
           SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal
           FROM snap WHERE c_custkey % 7 = 0
           UNION ALL
           SELECT c_custkey + 10000000, 0.0 FROM snap WHERE c_custkey % 13 = 0),
         chg AS (
           SELECT u.c_custkey, u.c_acctbal, CAST(2 AS BIGINT) AS version
           FROM upd u JOIN snap b USING (c_custkey)
           WHERE u.c_acctbal IS DISTINCT FROM b.c_acctbal),
         ins AS (
           SELECT u.c_custkey, u.c_acctbal, CAST(1 AS BIGINT) AS version
           FROM upd u ANTI JOIN snap b USING (c_custkey)),
         closed AS (
           SELECT b.c_custkey, b.c_acctbal, CAST(1 AS BIGINT) AS version,
             false AS is_current, '2026-01-01' AS valid_from,
             '2026-06-01' AS valid_to
           FROM snap b SEMI JOIN chg c USING (c_custkey)),
         carried AS (
           SELECT b.c_custkey, b.c_acctbal, CAST(1 AS BIGINT) AS version,
             true AS is_current, '2026-01-01' AS valid_from,
             '9999-12-31' AS valid_to
           FROM snap b ANTI JOIN chg c USING (c_custkey)),
         opened AS (
           SELECT c_custkey, c_acctbal, version, true AS is_current,
             '2026-06-01' AS valid_from, '9999-12-31' AS valid_to
           FROM (SELECT * FROM chg UNION ALL SELECT * FROM ins))
         SELECT * FROM closed UNION ALL SELECT * FROM carried
         UNION ALL SELECT * FROM opened""",
    "q161_pca_power" -> pcaPowerSql(d = 64, iters = 10),
    "q162_pit_join" ->
      """WITH snap AS (SELECT c_custkey, c_acctbal FROM customer),
         upd AS (
           SELECT c_custkey, c_acctbal + 500.0 AS c_acctbal
           FROM snap WHERE c_custkey % 3 = 0),
         chg AS (
           SELECT u.c_custkey, u.c_acctbal, CAST(2 AS BIGINT) AS version
           FROM upd u JOIN snap b USING (c_custkey)
           WHERE u.c_acctbal IS DISTINCT FROM b.c_acctbal),
         dim AS (
           SELECT b.c_custkey, b.c_acctbal, CAST(1 AS BIGINT) AS version,
             '1990-01-01' AS valid_from, '1995-06-17' AS valid_to
           FROM snap b SEMI JOIN chg c USING (c_custkey)
           UNION ALL
           SELECT b.c_custkey, b.c_acctbal, CAST(1 AS BIGINT) AS version,
             '1990-01-01', '9999-12-31'
           FROM snap b ANTI JOIN chg c USING (c_custkey)
           UNION ALL
           SELECT c_custkey, c_acctbal, version, '1995-06-17', '9999-12-31'
           FROM chg)
         SELECT o.o_orderkey,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
           d.c_acctbal AS acctbal_asof, d.version
         FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
           AND CAST(o.o_orderdate AS DATE) >= CAST(d.valid_from AS DATE)
           AND CAST(o.o_orderdate AS DATE) < CAST(d.valid_to AS DATE)""",
    "q163_pagerank" -> pageRankSql(iters = 10),
    "q164_assoc_rules" ->
      """WITH items AS MATERIALIZED (
           SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets FROM items),
         marg AS (SELECT brand, CAST(count(*) AS BIGINT) AS cnt
           FROM items GROUP BY brand),
         pairs AS (
           SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(count(*) AS BIGINT) AS pair_cnt
           FROM items a JOIN items b ON a.ok = b.ok AND a.brand < b.brand
           GROUP BY 1, 2 HAVING count(*) >= 5)
         SELECT p.brand_a, p.brand_b, p.pair_cnt,
           round(CAST(p.pair_cnt AS DOUBLE) / CAST(t.n_baskets AS DOUBLE), 6)
             AS support,
           round(CAST(p.pair_cnt AS DOUBLE) / CAST(ma.cnt AS DOUBLE), 6)
             AS confidence,
           round(CAST(p.pair_cnt * t.n_baskets AS DOUBLE)
             / CAST(ma.cnt * mb.cnt AS DOUBLE), 6) AS lift
         FROM pairs p
         JOIN marg ma ON p.brand_a = ma.brand
         JOIN marg mb ON p.brand_b = mb.brand
         CROSS JOIN tot t""",
    "q165_hopping_window" ->
      """WITH e AS (
           SELECT time_bucket(INTERVAL '15 minutes', ts) AS b, event_type, value
           FROM events),
         w AS (
           SELECT b AS ws, event_type, value FROM e
           UNION ALL
           SELECT b - INTERVAL '15 minutes', event_type, value FROM e)
         SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
         FROM w GROUP BY 1, 2""",
    "q166_funnel_steps" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         v AS (SELECT user_id, min(us) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(e.us) AS t2 FROM ev e JOIN v USING (user_id)
           WHERE e.event_type = 'click' AND e.us > v.t1 GROUP BY 1),
         p AS (SELECT e.user_id, min(e.us) AS t3 FROM ev e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.us > c.t2 GROUP BY 1),
         s AS (SELECT
           (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_after_view,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase_after_click)
         SELECT n_view, n_click_after_view, n_purchase_after_click,
           round(CAST(n_click_after_view AS DOUBLE)
             / CAST(n_view AS DOUBLE), 6) AS click_rate,
           round(CAST(n_purchase_after_click AS DOUBLE)
             / CAST(n_view AS DOUBLE), 6) AS purchase_rate
         FROM s""",
    "q167_bigram_lm" ->
      """WITH tk AS MATERIALIZED (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         pos AS MATERIALIZED (
           SELECT doc_id, i - 1 AS pos, w[i] AS prev, w[i+1] AS cur
           FROM tk, UNNEST(range(1, len(w))) AS t(i)),
         uni AS (SELECT tok AS term, CAST(count(*) AS BIGINT) AS cu
           FROM (SELECT unnest(w) AS tok FROM tk) GROUP BY 1),
         tu AS (SELECT CAST(sum(cu) AS BIGINT) AS t FROM uni),
         big AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb
           FROM pos GROUP BY 1, 2),
         cs AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cstart
           FROM big GROUP BY 1),
         lp AS (SELECT b.prev, b.cur,
             round(-ln(CAST(0.7 AS DOUBLE) *
                 (CAST(b.cb AS DOUBLE) / CAST(c.cstart AS DOUBLE)) +
               CAST(0.3 AS DOUBLE) *
                 (CAST(u.cu AS DOUBLE) / CAST(t.t AS DOUBLE))), 6) AS lp
           FROM big b JOIN cs c USING (prev)
           JOIN uni u ON u.term = b.cur CROSS JOIN tu t)
         SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(list_sum(list(l.lp ORDER BY p.pos)) / count(*), 4)
             AS avg_neg_logp
         FROM pos p JOIN lp l ON p.prev = l.prev AND p.cur = l.cur
         GROUP BY p.doc_id""",
    "q168_k_anonymity" ->
      """WITH g AS (
           SELECT c.c_mktsegment AS segment, n.n_name AS nation,
             CAST(count(*) AS BIGINT) AS n
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1, 2)
         SELECT segment, nation, n, false AS suppressed FROM g WHERE n >= 5
         UNION ALL
         SELECT '*' AS segment, '*' AS nation,
           CAST(coalesce(sum(n), 0) AS BIGINT) AS n, true AS suppressed
         FROM g WHERE n < 5 HAVING coalesce(sum(n), 0) > 0""",
    "q169_label_propagation" -> labelPropagationSql(rounds = 5),
    "q170_feature_hashing" ->
      """WITH terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\s+'))
             AS term
           FROM documents),
         loads AS (
           SELECT substr(md5(term), 1, 3) AS bucket,
             CAST(count(*) AS BIGINT) AS ld
           FROM terms GROUP BY 1)
         SELECT CAST(sum(ld) AS BIGINT) AS n_terms,
           CAST(count(*) AS BIGINT) AS n_buckets_used,
           CAST(max(ld) AS BIGINT) AS max_load,
           round(CAST(1.0 AS DOUBLE)
             - CAST(count(*) AS DOUBLE) / CAST(sum(ld) AS DOUBLE), 6)
             AS collision_frac
         FROM loads""",
    "q171_triangle_count" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_suppkey AS a, b.l_suppkey AS b
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2 HAVING count(*) >= 5),
         deg AS MATERIALIZED (
           SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
             SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
         o AS MATERIALIZED (
           SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
             CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v,
             CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS dv
           FROM (SELECT e.a, e.b, x.deg AS da, y.deg AS db
             FROM e JOIN deg x ON e.a = x.node JOIN deg y ON e.b = y.node)),
         tri AS MATERIALIZED (
           SELECT w.u, w.v1, w.v2 FROM (
             SELECT e1.u, e1.v AS v1, e2.v AS v2
             FROM o e1 JOIN o e2 ON e1.u = e2.u
               AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))) w
           JOIN o c ON c.u = w.v1 AND c.v = w.v2),
         cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
           SELECT u AS node FROM tri UNION ALL SELECT v1 FROM tri
           UNION ALL SELECT v2 FROM tri) GROUP BY 1)
         SELECT s.s_suppkey, coalesce(d.deg, 0) AS degree,
           coalesce(c.t, 0) AS n_triangles,
           CASE WHEN coalesce(d.deg, 0) >= 2
             THEN round(CAST(2 * coalesce(c.t, 0) AS DOUBLE)
               / CAST(d.deg * (d.deg - 1) AS DOUBLE), 6)
             ELSE 0.0 END AS clustering_coef
         FROM supplier s
         LEFT JOIN deg d ON s.s_suppkey = d.node
         LEFT JOIN cnt c ON s.s_suppkey = c.node""",
    "q172_markov_transitions" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
         nx AS (SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
               AS nxt
           FROM ev),
         pairs AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt
           FROM nx WHERE nxt IS NOT NULL GROUP BY 1, 2),
         marg AS (SELECT cur, CAST(sum(cnt) AS BIGINT) AS tot
           FROM pairs GROUP BY 1)
         SELECT p.cur, p.nxt, p.cnt,
           round(CAST(p.cnt AS DOUBLE) / CAST(m.tot AS DOUBLE), 6) AS prob
         FROM pairs p JOIN marg m USING (cur)""",
    "q173_containment_join" ->
      """WITH d AS MATERIALIZED (
           SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
               ELSE [] END) AS g
           FROM (SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS w FROM documents))
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS inter,
           CAST(len(a.g) AS BIGINT) AS sz_a,
           round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
             / CAST(len(a.g) AS DOUBLE), 6) AS containment
         FROM d a JOIN d b ON a.doc_id <> b.doc_id
         WHERE len(a.g) > 0
           AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
             / CAST(len(a.g) AS DOUBLE) >= 0.8""",
    "q174_rrf_fusion" ->
      s"""WITH toks AS (SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
           FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         comp AS (SELECT t.doc_id, t.term,
             round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
               (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS comp
           FROM tf t JOIN df USING (term) JOIN dl USING (doc_id)
           CROSS JOIN stats),
         bm AS (SELECT doc_id,
             round(list_sum(list(comp ORDER BY term)), 4) AS bm25
           FROM comp GROUP BY doc_id),
         lex AS (SELECT doc_id, bm25 FROM bm
           ORDER BY bm25 DESC, doc_id LIMIT 50),
         lexr AS (SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
               AS r_lex
           FROM lex),
         q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
           FROM embeddings),
         sem AS (SELECT vec_id AS doc_id, $cosineSqlBody AS cos
           FROM e, q ORDER BY cos DESC, doc_id LIMIT 50),
         semr AS (SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT)
               AS r_sem
           FROM sem),
         f AS (SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             l.r_lex, s.r_sem,
             coalesce(CAST(1.0 AS DOUBLE) / (60 + l.r_lex),
               CAST(0.0 AS DOUBLE)) +
             coalesce(CAST(1.0 AS DOUBLE) / (60 + s.r_sem),
               CAST(0.0 AS DOUBLE)) AS rrf0
           FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id)
         SELECT doc_id, round(rrf0, 8) AS rrf, r_lex, r_sem
         FROM f ORDER BY rrf DESC, doc_id LIMIT 20""",
    "q175_weighted_sample" ->
      """SELECT doc_id, source, n_chars,
           round(-ln((CAST(CAST(concat('0x',
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               AS DOUBLE) + 0.5) / 4294967296.0)
             / CAST(n_chars AS DOUBLE), 6) AS clock
         FROM documents ORDER BY clock, doc_id LIMIT 20""",
    "q176_stratified_sample" ->
      """SELECT source, doc_id, hk FROM (
           SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents) WHERE rn <= 5""",
    "q177_moment_profile" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS s1,
           CAST(sum(n_chars * n_chars) AS BIGINT) AS s2,
           CAST(sum(n_chars * n_chars * n_chars) AS BIGINT) AS s3,
           CAST(sum(n_chars * n_chars * n_chars * n_chars) AS BIGINT) AS s4
           FROM documents GROUP BY source),
         e AS (SELECT source, n,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
           CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
           CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
           CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4
           FROM g),
         v AS (SELECT source, n, m, e2, e3, e4, e2 - m * m AS v FROM e)
         SELECT source, n, round(m, 4) AS mean, round(sqrt(v), 4) AS stddev,
           round((e3 - m * 3.0 * v - m * m * m) / (v * sqrt(v)), 4)
             AS skewness,
           round((e4 - 4.0 * m * e3 + 6.0 * m * m * e2
             - 3.0 * m * m * m * m) / (v * v), 4) AS kurtosis
         FROM v""",
    "q178_ks_drift" ->
      """WITH psv AS (SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
         st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
           FROM psv GROUP BY 1),
         corpus AS (SELECT x, CAST(sum(c) AS BIGINT) AS cc
           FROM psv GROUP BY 1),
         ct AS (SELECT CAST(sum(cc) AS BIGINT) AS nc FROM corpus),
         ccum AS (SELECT x,
             CAST(sum(cc) OVER (ORDER BY x) AS BIGINT) AS ccum
           FROM corpus),
         grid AS (SELECT s.source, s.ns, v.x, coalesce(p.c, 0) AS c
           FROM st s CROSS JOIN (SELECT x FROM corpus) v
           LEFT JOIN psv p ON p.source = s.source AND p.x = v.x),
         scum AS (SELECT source, ns, x,
             CAST(sum(c) OVER (PARTITION BY source ORDER BY x) AS BIGINT)
               AS scum
           FROM grid)
         SELECT source, ns AS n,
           round(max(abs(CAST(scum AS DOUBLE) / CAST(ns AS DOUBLE)
             - CAST(ccum AS DOUBLE) / CAST(nc AS DOUBLE))), 6) AS ks
         FROM scum JOIN ccum USING (x) CROSS JOIN ct
         GROUP BY source, ns""",
    "q179_link_prediction" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         e AS MATERIALIZED (
           SELECT a.l_suppkey AS sa, b.l_suppkey AS sb
           FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2 HAVING count(*) >= 20),
         und AS MATERIALIZED (
           SELECT sa, sb FROM e UNION ALL SELECT sb, sa FROM e),
         deg AS (SELECT sa AS node, CAST(count(*) AS BIGINT) AS deg
           FROM und GROUP BY 1),
         compz AS (SELECT node AS z,
             round(CAST(1.0 AS DOUBLE) / ln(CAST(deg AS DOUBLE)), 6) AS comp
           FROM deg WHERE deg >= 2),
         w AS (SELECT e1.sa AS u, e1.sb AS z, e2.sb AS v
           FROM und e1 JOIN und e2 ON e1.sb = e2.sa AND e1.sa < e2.sb),
         cand AS (SELECT u, z, v FROM w
           ANTI JOIN e ON w.u = e.sa AND w.v = e.sb)
         SELECT u AS s_a, v AS s_b, CAST(count(*) AS BIGINT) AS cn,
           round(list_sum(list(c.comp ORDER BY c.z)), 4) AS adamic_adar
         FROM cand JOIN compz c USING (z)
         GROUP BY u, v
         ORDER BY adamic_adar DESC, s_a, s_b LIMIT 20""",
    "q180_frequent_triples" ->
      """WITH items AS MATERIALIZED (
           SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets
           FROM items),
         l2 AS MATERIALIZED (
           SELECT x.brand AS pa, y.brand AS pb
           FROM items x JOIN items y ON x.ok = y.ok AND x.brand < y.brand
           CROSS JOIN tot
           GROUP BY 1, 2, n_baskets HAVING count(*) * 200 >= n_baskets),
         cand AS (
           SELECT m.pa AS a, m.pb AS b, n.pb AS c
           FROM l2 m JOIN l2 n ON m.pa = n.pa AND m.pb < n.pb
           SEMI JOIN l2 z ON z.pa = m.pb AND z.pb = n.pb),
         tri AS (
           SELECT i1.brand AS a, i2.brand AS b, i3.brand AS c
           FROM items i1
           JOIN items i2 ON i1.ok = i2.ok AND i1.brand < i2.brand
           JOIN items i3 ON i1.ok = i3.ok AND i2.brand < i3.brand
           SEMI JOIN cand ON cand.a = i1.brand AND cand.b = i2.brand
             AND cand.c = i3.brand)
         SELECT a, b, c, CAST(count(*) AS BIGINT) AS cnt,
           round(CAST(count(*) AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6)
             AS support
         FROM tri CROSS JOIN tot
         GROUP BY a, b, c, n_baskets HAVING count(*) * 200 >= n_baskets""",
    "q181_skyline" ->
      """WITH p AS (
           SELECT doc_id, CAST(len(w) AS BIGINT) AS nt,
             round(CAST(len(list_distinct(w)) AS DOUBLE)
               / CAST(len(w) AS DOUBLE), 6) AS ttr
           FROM (SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS w FROM documents))
         SELECT doc_id, nt AS n_tokens, ttr FROM p a
         WHERE NOT EXISTS (
           SELECT 1 FROM p b WHERE b.nt >= a.nt AND b.ttr >= a.ttr
             AND (b.nt > a.nt OR b.ttr > a.ttr))""",
    "q182_quantile_normalize" ->
      """WITH d AS (SELECT doc_id, source, n_chars AS x FROM documents),
         ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
           FROM d GROUP BY 1),
         nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
         r AS (SELECT doc_id, source, x,
             CAST(row_number() OVER (PARTITION BY source ORDER BY x, doc_id)
               AS BIGINT) AS r
           FROM d),
         tt AS (SELECT r.doc_id, r.source, r.x,
             (r.r * nt.n + ns.n_s - 1) // ns.n_s AS t
           FROM r JOIN ns USING (source) CROSS JOIN nt),
         grid AS (SELECT x AS gx,
             CAST(sum(c) OVER (ORDER BY x) AS BIGINT) AS ccum,
             CAST(sum(c) OVER (ORDER BY x) - c AS BIGINT) AS pcum
           FROM (SELECT x, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1))
         SELECT doc_id, source, x, gx AS norm_x
         FROM tt JOIN grid ON tt.t > grid.pcum AND tt.t <= grid.ccum""",
    "q183_retrieval_eval" ->
      s"""WITH q8 AS (SELECT vec_id AS qid, label AS qlabel,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id < 8),
         e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
           FROM embeddings),
         sc AS (SELECT q8.qid, q8.qlabel, e.vec_id, e.label,
             $cosineSqlBody AS cos
           FROM e CROSS JOIN q8),
         top AS (SELECT * FROM (
             SELECT qid, qlabel, vec_id, label, cos,
               CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
             FROM sc) WHERE rank <= 10),
         comp AS (SELECT qid, qlabel, rank,
             CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
             round(CAST(CASE WHEN label = qlabel THEN 1 ELSE 0 END AS DOUBLE)
               / log2(CAST(rank AS DOUBLE) + 1.0), 6) AS comp
           FROM top),
         ag AS (SELECT qid, qlabel, CAST(sum(rel) AS BIGINT) AS n_rel_top10,
             list_sum(list(comp ORDER BY rank)) AS dcg,
             min(CASE WHEN rel = 1 THEN rank END) AS first_rel
           FROM comp GROUP BY 1, 2),
         nl AS (SELECT label AS qlabel, CAST(count(*) AS BIGINT) AS n_label
           FROM embeddings GROUP BY 1),
         fin AS (SELECT ag.qid, ag.n_rel_top10, ag.dcg, ag.first_rel,
             least(10, nl.n_label) AS m
           FROM ag JOIN nl USING (qlabel))
         SELECT qid, n_rel_top10,
           round(dcg / list_sum(list_transform(range(1, m + 1),
             i -> round(CAST(1.0 AS DOUBLE)
               / log2(CAST(i AS DOUBLE) + 1.0), 6))), 6) AS ndcg10,
           coalesce(round(CAST(1.0 AS DOUBLE) / CAST(first_rel AS DOUBLE), 6),
             CAST(0.0 AS DOUBLE)) AS mrr
         FROM fin""",
    "q184_sssp" -> ssspSql(rounds = 6),
    "q185_noisy_counts" ->
      """WITH g AS (
           SELECT c.c_mktsegment AS segment, n.n_name AS nation,
             CAST(count(*) AS BIGINT) AS n
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1, 2),
         u AS (SELECT segment, nation, n,
             (CAST(CAST(concat('0x', substr(md5(concat(segment, '|', nation)),
               1, 8)) AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u
           FROM g)
         SELECT segment, nation, n,
           round(-CAST(2.0 AS DOUBLE) * sign(u - 0.5)
             * ln(CAST(1.0 AS DOUBLE) - CAST(2.0 AS DOUBLE) * abs(u - 0.5)), 4)
             AS noise,
           round(CAST(n AS DOUBLE) + (-CAST(2.0 AS DOUBLE) * sign(u - 0.5)
             * ln(CAST(1.0 AS DOUBLE) - CAST(2.0 AS DOUBLE) * abs(u - 0.5))), 4)
             AS noisy_n
         FROM u""",
    "q186_cdc_compact" ->
      """WITH chg AS (
           SELECT o_custkey AS ckey, o_orderkey AS seq,
             CASE WHEN o_orderkey % 10 = 9 THEN 'D'
               WHEN o_orderkey % 10 >= 6 THEN 'U' ELSE 'I' END AS op,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS val
           FROM orders),
         lst AS (SELECT ckey, max(seq) AS seq FROM chg GROUP BY 1)
         SELECT c.ckey, c.seq, c.op, c.val
         FROM chg c JOIN lst USING (ckey, seq) WHERE c.op <> 'D'""",
    "q187_path_trigrams" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
         x AS (SELECT event_type AS e1,
             lead(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS e3
           FROM ev)
         SELECT concat_ws('>', e1, e2, e3) AS path,
           CAST(count(*) AS BIGINT) AS cnt
         FROM x WHERE e3 IS NOT NULL
         GROUP BY 1 ORDER BY cnt DESC, path LIMIT 20""",
    "q188_funnel_latency" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         v AS (SELECT user_id, min(us) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY 1),
         pu AS (SELECT e.user_id, v.t1, min(e.us) AS t2
           FROM ev e JOIN v USING (user_id)
           WHERE e.event_type = 'purchase' AND e.us > v.t1 GROUP BY 1, 2),
         d AS (SELECT t2 - t1 AS delay_us FROM pu)
         SELECT CAST(count(*) AS BIGINT) AS n_conversions,
           round(CAST(sum(delay_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / 1000000.0, 4) AS avg_s,
           round(median(delay_us) / 1000000.0, 4) AS median_s,
           round(quantile_cont(delay_us, 0.9) / 1000000.0, 4) AS p90_s
         FROM d""",
    "q189_ewma_daily" ->
      """WITH daily AS MATERIALIZED (
           SELECT day, x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
           FROM (SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1)),
         comp AS (SELECT b.day, b.x, a.t AS ti,
             round((CASE WHEN a.t = 1
               THEN pow(CAST(0.7 AS DOUBLE), CAST(b.t - 1 AS DOUBLE))
               ELSE CAST(0.3 AS DOUBLE)
                 * pow(CAST(0.7 AS DOUBLE), CAST(b.t - a.t AS DOUBLE)) END)
               * CAST(a.x AS DOUBLE), 6) AS c
           FROM daily b JOIN daily a ON a.t <= b.t)
         SELECT day, x, round(list_sum(list(c ORDER BY ti)), 4) AS ewma
         FROM comp GROUP BY day, x""",
    "q190_seasonality" ->
      """WITH s AS (
           SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
             (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
             CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM s)
         SELECT dow, hour, cnt,
           round(CAST(cnt * 168 AS DOUBLE) / CAST(total AS DOUBLE), 4) AS lift
         FROM s CROSS JOIN t""",
    "q191_cusum_changepoint" ->
      """WITH daily AS MATERIALIZED (
           SELECT day, x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(sum(x) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
           FROM (SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1)),
         st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
           CAST(sum(x) AS BIGINT) AS tot FROM daily),
         cv AS (SELECT d.day, d.t, d.cum,
             CAST(d.cum AS DOUBLE) - CAST(d.t AS DOUBLE)
               * (CAST(st.tot AS DOUBLE) / CAST(st.nd AS DOUBLE)) AS cusum,
             st.nd
           FROM daily d CROSS JOIN st),
         cp AS (SELECT day AS cp_day, cusum AS cp_cusum, nd
           FROM cv ORDER BY abs(cusum) DESC, day LIMIT 1)
         SELECT cp.cp_day, round(cp.cp_cusum, 4) AS cusum, cp.nd AS n_days,
           round(CAST(sum(CASE WHEN d.day <= cp.cp_day THEN d.x END) AS DOUBLE)
             / CAST(count(CASE WHEN d.day <= cp.cp_day THEN 1 END) AS DOUBLE),
             4) AS mean_before,
           round(CAST(sum(CASE WHEN d.day > cp.cp_day THEN d.x END) AS DOUBLE)
             / CAST(count(CASE WHEN d.day > cp.cp_day THEN 1 END) AS DOUBLE),
             4) AS mean_after
         FROM daily d CROSS JOIN cp
         GROUP BY cp.cp_day, cp.cp_cusum, cp.nd""",
    "q192_rfm" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           CAST(o_totalprice AS DECIMAL(18,2)) AS tp FROM orders),
         mx AS (SELECT max(d) AS dmax FROM o),
         cust AS (SELECT o_custkey,
             CAST(date_diff('day', max(d), (SELECT dmax FROM mx)) AS BIGINT)
               AS r,
             CAST(count(*) AS BIGINT) AS f, sum(tp) AS m
           FROM o GROUP BY 1),
         th AS (SELECT
             quantile_cont(CAST(r AS DOUBLE), 0.25) AS r1,
             quantile_cont(CAST(r AS DOUBLE), 0.5) AS r2,
             quantile_cont(CAST(r AS DOUBLE), 0.75) AS r3,
             quantile_cont(CAST(f AS DOUBLE), 0.25) AS f1,
             quantile_cont(CAST(f AS DOUBLE), 0.5) AS f2,
             quantile_cont(CAST(f AS DOUBLE), 0.75) AS f3,
             quantile_cont(CAST(m AS DOUBLE), 0.25) AS m1,
             quantile_cont(CAST(m AS DOUBLE), 0.5) AS m2,
             quantile_cont(CAST(m AS DOUBLE), 0.75) AS m3
           FROM cust),
         coded AS (SELECT
             5 - (CASE WHEN CAST(r AS DOUBLE) <= r1 THEN 1
               WHEN CAST(r AS DOUBLE) <= r2 THEN 2
               WHEN CAST(r AS DOUBLE) <= r3 THEN 3 ELSE 4 END) AS r_code,
             CASE WHEN CAST(f AS DOUBLE) <= f1 THEN 1
               WHEN CAST(f AS DOUBLE) <= f2 THEN 2
               WHEN CAST(f AS DOUBLE) <= f3 THEN 3 ELSE 4 END AS f_code,
             CASE WHEN CAST(m AS DOUBLE) <= m1 THEN 1
               WHEN CAST(m AS DOUBLE) <= m2 THEN 2
               WHEN CAST(m AS DOUBLE) <= m3 THEN 3 ELSE 4 END AS m_code,
             m
           FROM cust CROSS JOIN th)
         SELECT r_code, f_code, m_code,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(m) AS DOUBLE) / CAST(count(*) AS DOUBLE), 2)
             AS avg_monetary
         FROM coded GROUP BY 1, 2, 3""",
    "q193_minhash_accuracy" -> minhashAccuracySql,
    "q194_lang_entropy" ->
      """WITH lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
           FROM documents GROUP BY 1, 2),
         st AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot
           FROM lc GROUP BY 1),
         terms AS (SELECT lc.source, lc.lang, st.tot,
             round(-((CAST(lc.cnt AS DOUBLE) / CAST(st.tot AS DOUBLE))
               * ln(CAST(lc.cnt AS DOUBLE) / CAST(st.tot AS DOUBLE))), 6)
               AS term
           FROM lc JOIN st USING (source))
         SELECT source, tot AS n_docs, CAST(count(*) AS BIGINT) AS n_langs,
           round(list_sum(list(term ORDER BY lang)), 4) AS entropy
         FROM terms GROUP BY source, tot""",
    "q195_token_gini" ->
      """WITH tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS x
           FROM (SELECT source,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
             FROM documents) GROUP BY 1, 2),
         idx AS (SELECT source, x,
             CAST(row_number() OVER (PARTITION BY source ORDER BY x, term)
               AS BIGINT) AS i
           FROM tf),
         g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(i * x) AS BIGINT) AS a
           FROM idx GROUP BY 1)
         SELECT source, n AS n_terms, sx AS n_tokens,
           round(CAST(2 * a - (n + 1) * sx AS DOUBLE)
             / CAST(n * sx AS DOUBLE), 6) AS gini
         FROM g""",
    "q196_lsh_pr_curve" -> lshPrCurveSql,
    "q197_skew_report" ->
      """WITH kc AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
           FROM lineitem GROUP BY 1),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows FROM kc)
         SELECT l_partkey, cnt,
           round(CAST(cnt AS DOUBLE)
             / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)), 4)
             AS rel_load
         FROM kc CROSS JOIN st
         ORDER BY cnt DESC, l_partkey LIMIT 10""",
    "q198_catalog_stats" ->
      Seq(
        "region" -> "r_regionkey", "nation" -> "n_nationkey",
        "customer" -> "c_custkey", "supplier" -> "s_suppkey",
        "part" -> "p_partkey", "orders" -> "o_orderkey",
        "lineitem" -> "l_orderkey", "events" -> "event_id",
        "documents" -> "doc_id", "embeddings" -> "vec_id")
        .map { case (t, pk) =>
          s"""SELECT '$t' AS table_name, '$pk' AS pk,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT $pk) AS BIGINT) AS n_distinct_pk FROM $t"""
        }.mkString("\n UNION ALL \n"),
    "q199_yoy_growth" ->
      """WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1)
         SELECT month, CAST(rev AS DOUBLE) AS revenue,
           round(CAST(rev AS DOUBLE)
             / CAST(lag(rev, 12) OVER (ORDER BY month) AS DOUBLE)
             - CAST(1.0 AS DOUBLE), 6) AS yoy_growth
         FROM m""",
    "q200_pareto_revenue" ->
      """WITH cust AS (SELECT o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS rev_c
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total_c,
           CAST(count(*) AS BIGINT) AS n FROM cust),
         ranked AS (SELECT rev_c,
             CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_c
           FROM cust)
         SELECT n AS n_customers,
           CAST(sum(CASE WHEN (cum_c - rev_c) * 10 < total_c * 8
             THEN 1 ELSE 0 END) AS BIGINT) AS n_top80,
           round(CAST(sum(CASE WHEN (cum_c - rev_c) * 10 < total_c * 8
             THEN 1 ELSE 0 END) AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS top80_frac,
           round(CAST(total_c AS DOUBLE) / 100.0, 2) AS total_revenue
         FROM ranked CROSS JOIN tot
         GROUP BY n, total_c""",
    "q201_top_brands_per_nation" ->
      """WITH rolled AS (
           SELECT n.n_name AS nation, p.p_brand AS brand,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
               (CAST(1 AS DECIMAL(18,2))
                 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2)
         SELECT nation, brand, round(CAST(rev AS DOUBLE), 2) AS revenue
         FROM (SELECT nation, brand, rev,
             row_number() OVER (PARTITION BY nation
               ORDER BY rev DESC, brand) AS rn
           FROM rolled) WHERE rn <= 3""",
    "q202_fk_audit" ->
      """SELECT 'lineitem.l_orderkey -> orders' AS fk,
           CAST(count(*) AS BIGINT) AS n_orphans,
           CAST(count(DISTINCT k) AS BIGINT) AS n_orphan_keys
         FROM (SELECT l_orderkey AS k FROM lineitem) f
         ANTI JOIN (SELECT o_orderkey AS k FROM orders) p USING (k)
         UNION ALL
         SELECT 'lineitem.l_partkey -> part',
           CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
         FROM (SELECT l_partkey AS k FROM lineitem) f
         ANTI JOIN (SELECT p_partkey AS k FROM part) p USING (k)
         UNION ALL
         SELECT 'lineitem.l_suppkey -> supplier',
           CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
         FROM (SELECT l_suppkey AS k FROM lineitem) f
         ANTI JOIN (SELECT s_suppkey AS k FROM supplier) p USING (k)
         UNION ALL
         SELECT 'orders.o_custkey -> customer',
           CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
         FROM (SELECT o_custkey AS k FROM orders) f
         ANTI JOIN (SELECT c_custkey AS k FROM customer) p USING (k)""",
    "q155_dedup_impact" ->
      s"""WITH RECURSIVE $dedupKeepCtes,
         toks AS (SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tok
           FROM documents),
         kept AS (SELECT t.doc_id, t.source, t.n_tok,
             (cc.vertex IS NULL OR surv.sid IS NOT NULL) AS keep
           FROM toks t
           LEFT JOIN cc ON t.doc_id = cc.vertex
           LEFT JOIN surv ON t.doc_id = surv.sid)
         SELECT source,
           CAST(count(*) AS BIGINT) AS docs_before,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_after,
           CAST(sum(n_tok) AS BIGINT) AS tokens_before,
           CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_after,
           round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS doc_keep_rate,
           round(CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS DOUBLE)
             / sum(n_tok), 6) AS token_keep_rate
         FROM kept GROUP BY source""",
    "q156_contamination_curve" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         sh AS (SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(w)-1),
               i -> array_to_string(w[i:i+2], ' ')))) AS shingle
           FROM toks WHERE len(w) >= 3),
         ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 50),
         tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 50),
         rare AS (SELECT shingle FROM tr GROUP BY shingle
           HAVING count(DISTINCT doc_id) <= 64),
         shared AS (SELECT tr.doc_id, count(DISTINCT tr.shingle) AS n
           FROM tr JOIN rare USING (shingle) JOIN ev USING (shingle)
           GROUP BY tr.doc_id),
         th AS (SELECT unnest([1, 2, 4, 8]) AS threshold),
         fl AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_flagged
           FROM th JOIN shared ON shared.n >= th.threshold
           GROUP BY threshold),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_train
           FROM documents WHERE doc_id >= 50)
         SELECT CAST(th.threshold AS INTEGER) AS threshold,
           coalesce(n_flagged, 0) AS n_flagged, n_train,
           round(CAST(coalesce(n_flagged, 0) AS DOUBLE) / n_train, 6)
             AS flagged_frac
         FROM th LEFT JOIN fl USING (threshold), tot""",
    "q141_mix_apply" ->
      s"""WITH alloc AS ($budgetAllocSql),
         rates AS (SELECT source, alloc_tokens / n_tokens AS rate FROM alloc)
         SELECT d.doc_id, d.source
         FROM documents d JOIN rates USING (source)
         WHERE CAST(CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
               / 4294967296.0 < rate""",
    "q140_topk_per_key" ->
      """SELECT event_type, event_id, value FROM (
           SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value DESC, event_id) AS rn
           FROM events) t
         WHERE rn <= 3""",
    "q71_curation" -> curationSql,
    "q72_neardup_components" -> neardupComponentsSql,
    "q78_contamination" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         sh AS (SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(w)-1),
               i -> array_to_string(w[i:i+2], ' ')))) AS shingle
           FROM toks WHERE len(w) >= 3),
         ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id < 50),
         tr AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id >= 50),
         rare AS (SELECT shingle FROM tr GROUP BY shingle
           HAVING count(DISTINCT train_id) <= 64)
         SELECT eval_id, count(DISTINCT shingle) AS n_shared_shingles,
           count(DISTINCT train_id) AS n_contaminating_docs
         FROM ev JOIN tr USING (shingle) JOIN rare USING (shingle)
         GROUP BY eval_id""",
    "q76_stratified_sample" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
               / 4294967296.0 AS frac
           FROM documents)
         WHERE frac < CASE WHEN lang = 'en' THEN 0.5 ELSE 0.2 END""",
    "q77_sequence_packing" ->
      """WITH t AS (SELECT doc_id, lang,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
         FROM documents)
         SELECT doc_id, lang, n_tokens,
           CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix_tokens,
           CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS pack_id
         FROM t""",
    "q75_kmv_sketch" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
           CAST(CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             / 4294967296.0 AS hv
         FROM lineitem),
         r AS (SELECT l_returnflag, hv,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS nd
           FROM h)
         SELECT l_returnflag,
           CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
                ELSE 63.0 / max(CASE WHEN rn = 64 THEN hv END) END AS distinct_est
         FROM r GROUP BY l_returnflag""",
    "q73_salted_agg" ->
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",
    "q74_media_features" ->
      """SELECT doc_id AS media_id, 'text/plain' AS mime,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         CAST(4 AS INTEGER) AS n_features
         FROM documents""",
    "q27_composite_join" ->
      """WITH pairs AS (SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
           FROM lineitem GROUP BY 1, 2)
         SELECT l.l_partkey, l.l_suppkey,
           CAST(sum(CASE WHEN l.l_quantity > p.avg_qty THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           count(*) AS n_total
         FROM lineitem l JOIN pairs p
           ON l.l_partkey = p.l_partkey AND l.l_suppkey = p.l_suppkey
         GROUP BY 1, 2""",
    "q43_json_build" ->
      """SELECT o_orderpriority,
         '[' || string_agg(obj, ',' ORDER BY obj) || ']' AS status_json
         FROM (SELECT o_orderpriority, o_orderstatus,
                 '{"status":"' || o_orderstatus || '","n":' || CAST(count(*) AS VARCHAR) || '}' AS obj
               FROM orders GROUP BY 1, 2)
         GROUP BY o_orderpriority""",
    "q45_any_flag" ->
      """WITH flags AS (SELECT l_partkey,
           max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
           FROM lineitem GROUP BY 1)
         SELECT p_brand, CAST(sum(COALESCE(has_r, 0)) AS BIGINT) AS n_parts_with_returns,
           count(*) AS n_parts
         FROM part LEFT JOIN flags ON p_partkey = l_partkey
         GROUP BY p_brand""",
    "q46_flatten_distinct" ->
      """WITH per_order AS (SELECT l_orderkey,
           list(DISTINCT l_returnflag) AS flags FROM lineitem GROUP BY 1)
         SELECT o_orderpriority,
           array_to_string(list_sort(list_distinct(flatten(list(flags)))), ',') AS all_flags
         FROM orders JOIN per_order ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority""",
    "q47_window_list" ->
      """SELECT l_suppkey, max(ship_seq) AS ship_dates FROM (
           SELECT l_suppkey,
             string_agg(strftime(l_shipdate, '%Y-%m-%d'), ',') OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ship_seq
           FROM lineitem WHERE l_suppkey <= 3)
         GROUP BY l_suppkey""",
    "q48_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         COALESCE(o_orderpriority, 'ALL') AS priority, count(*) AS n
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
    "q65_median" ->
      """SELECT l_returnflag, median(l_quantity) AS median_qty, count(*) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q63_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         COALESCE(o_orderpriority, 'ALL') AS priority, count(*) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "q64_analytics" ->
      """SELECT o_custkey, o_orderkey,
         lag(o_totalprice, 1) OVER w AS prev_price,
         lead(o_totalprice, 1) OVER w AS next_price,
         first_value(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "q49_intersect" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         INTERSECT
         SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997""",
    "q50_except" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         EXCEPT
         SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997""",
    "q51_date_parts" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n
         FROM orders GROUP BY 1, 2""",
    "q52_score" ->
      """WITH n AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)
         SELECT c_custkey,
           (CASE WHEN c_acctbal > 5000 THEN 40 WHEN c_acctbal > 1000 THEN 20 ELSE 0 END
            + CASE WHEN c_mktsegment = 'BUILDING' THEN 10 ELSE 0 END
            + CAST(floor(least(COALESCE(n_orders, 0), 7) * 100 / 7.0) AS INT)) AS metadata_score
         FROM customer LEFT JOIN n ON c_custkey = o_custkey""",
    "q53_nodes" ->
      """SELECT 'customer' AS node_type, c_custkey AS node_id,
         '{"name":"' || c_name || '"}' AS data FROM customer
         UNION ALL
         SELECT 'supplier', s_suppkey, '{"name":"' || s_name || '"}' FROM supplier""",
    "q54_edges" ->
      """SELECT DISTINCT label, src, dst FROM (
         SELECT 'placed' AS label, o_custkey AS src, o_orderkey AS dst FROM orders
         UNION ALL
         SELECT 'contains', l_orderkey, l_partkey FROM lineitem)""",
    "q68_ancestor_closure" ->
      """WITH RECURSIVE e AS (
           SELECT p_partkey AS child, p_partkey // 2 AS parent
           FROM part WHERE p_partkey > 1),
         anc AS (
           SELECT child, parent FROM e
           UNION
           SELECT a.child, e.parent FROM anc a JOIN e ON a.parent = e.child)
         SELECT child, parent FROM anc""",
    // Nested parents tree: each model's ancestor CHAIN is linear
    // (single parent), so the recursive CTE accumulates the opening
    // half of the nested JSON walking up, then closes depth brackets.
    "q112_parents_tree" ->
      """WITH RECURSIVE m AS (
           SELECT 'M' || p_partkey AS id,
             CASE WHEN p_partkey % 2 = 0 THEN 'PDX' ELSE 'organoid' END AS mtype,
             CASE WHEN p_partkey > 1 THEN 'M' || (p_partkey // 2) END AS pid
           FROM part WHERE p_partkey < 2048),
         walk AS (
           SELECT c.id AS model, p.pid AS anc_pid,
             '[{"external_model_id":"' || p.id || '","type":"' || p.mtype ||
               '","parents":' AS prefix,
             1 AS depth
           FROM m c JOIN m p ON c.pid = p.id
           UNION ALL
           SELECT w.model, p.pid,
             w.prefix || '[{"external_model_id":"' || p.id || '","type":"' ||
               p.mtype || '","parents":',
             w.depth + 1
           FROM walk w JOIN m p ON w.anc_pid = p.id)
         SELECT m.id AS external_model_id,
           w.prefix || 'null' || repeat('}]', w.depth) AS parents_json
         FROM m LEFT JOIN (
           SELECT model, prefix, depth FROM walk
           WHERE anc_pid IS NULL
              OR NOT EXISTS (SELECT 1 FROM m p2 WHERE p2.id = anc_pid)) w
           ON w.model = m.id""",
    // 3-level hierarchy: children JSON built bottom-up in two passes
    // (leaf-children aggregate, then the general wrap), parents in two
    // joins; model_relationships/has_relations as in updates.sql:1-39.
    "q113_model_relationships" ->
      """WITH m AS (
           SELECT 'M' || p_partkey AS id,
             CASE p_partkey % 3 WHEN 0 THEN 'PDX' WHEN 1 THEN 'organoid'
               ELSE 'cell line' END AS mtype,
             CASE WHEN p_partkey % 16 = 0 THEN NULL
                  WHEN p_partkey % 16 <= 3 THEN 'M' || (p_partkey - (p_partkey % 16))
                  ELSE 'M' || (p_partkey - (p_partkey % 16) + 1 + ((p_partkey % 16 - 4) % 3))
             END AS pid
           FROM part),
         link AS (SELECT c.id, c.mtype, c.pid FROM m c JOIN m p ON c.pid = p.id),
         cj1 AS (
           SELECT l.pid AS id,
             '[' || string_agg('{"external_model_id":"' || l.id || '","type":"' ||
               l.mtype || '","children":null}', ',' ORDER BY l.id) || ']' AS cj
           FROM link l
           WHERE NOT EXISTS (SELECT 1 FROM link g WHERE g.pid = l.id)
           GROUP BY l.pid),
         cj2 AS (
           SELECT l.pid AS id,
             '[' || string_agg('{"external_model_id":"' || l.id || '","type":"' ||
               l.mtype || '","children":' || coalesce(c1.cj, 'null') || '}',
               ',' ORDER BY l.id) || ']' AS cj
           FROM link l LEFT JOIN cj1 c1 ON c1.id = l.id
           GROUP BY l.pid),
         pj1 AS (
           SELECT c.id,
             '[{"external_model_id":"' || p.id || '","type":"' || p.mtype ||
               '","parents":null}]' AS pj
           FROM link c JOIN m p ON c.pid = p.id
           WHERE p.pid IS NULL
              OR NOT EXISTS (SELECT 1 FROM m gp WHERE gp.id = p.pid)),
         pj2 AS (
           SELECT c.id,
             '[{"external_model_id":"' || p.id || '","type":"' || p.mtype ||
               '","parents":' || p1.pj || '}]' AS pj
           FROM link c JOIN m p ON c.pid = p.id JOIN pj1 p1 ON p1.id = p.id)
         SELECT m.id AS external_model_id,
           '{"parents":' || coalesce(coalesce(pj2.pj, pj1.pj), 'null') ||
             ',"children":' || coalesce(cj2.cj, 'null') || '}' AS model_relationships,
           (coalesce(pj2.pj, pj1.pj) IS NOT NULL OR cj2.cj IS NOT NULL) AS has_relations
         FROM m LEFT JOIN pj1 ON pj1.id = m.id
                LEFT JOIN pj2 ON pj2.id = m.id
                LEFT JOIN cj2 ON cj2.id = m.id""",
    "q116_bucketed_join" ->
      """SELECT o.o_custkey, count(1) AS n_items,
         CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY o.o_custkey""",
    "q117_partitioned_scan" ->
      """SELECT event_type, count(1) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(DISTINCT user_id) AS n_users
         FROM events WHERE event_type IN ('purchase', 'error')
         GROUP BY event_type""",
    // Reachable subgraph per root (multi-source), nodes/edges JSON with
    // deterministic sort — UNION (not ALL) in the recursive member is
    // the cycle-safe dedup.
    "q114_knowledge_graph" ->
      """WITH RECURSIVE e AS (
           SELECT o_custkey AS src, o_orderkey + 10000000 AS dst,
             'placed' AS label FROM orders
           UNION ALL
           SELECT DISTINCT l_orderkey + 10000000, l_partkey + 20000000,
             'contains' FROM lineitem
           UNION ALL
           SELECT DISTINCT l_partkey + 20000000, l_suppkey + 30000000,
             'supplied_by' FROM lineitem),
         n AS (
           SELECT c_custkey AS node_id, 'customer' AS node_type,
             '{"name":"' || c_name || '"}' AS data FROM customer
           UNION ALL
           SELECT o_orderkey + 10000000, 'order',
             '{"status":"' || o_orderstatus || '"}' FROM orders
           UNION ALL
           SELECT p_partkey + 20000000, 'part',
             '{"name":"' || p_name || '"}' FROM part
           UNION ALL
           SELECT s_suppkey + 30000000, 'supplier',
             '{"name":"' || s_name || '"}' FROM supplier),
         roots AS (SELECT c_custkey AS root FROM customer
                   WHERE c_custkey IN (1, 7, 42)),
         reach AS (
           SELECT r.root, e.src, e.dst, e.label FROM roots r
           JOIN e ON e.src = r.root
           UNION
           SELECT c.root, e.src, e.dst, e.label FROM reach c
           JOIN e ON e.src = c.dst),
         member AS (
           -- outer DISTINCT, not UNION-dedup: DuckDB fails to dedup a
           -- UNION whose branches both re-reference a recursive CTE
           SELECT DISTINCT root, node_id FROM (
             SELECT root, src AS node_id FROM reach
             UNION ALL SELECT root, dst FROM reach)),
         nj AS (
           SELECT member.root,
             '[' || string_agg('{"id":' || n.node_id || ',"node_type":"' ||
               n.node_type || '","data":' || n.data || '}',
               ',' ORDER BY n.node_id, n.node_type, n.data) || ']' AS nodes_json
           FROM member JOIN n ON n.node_id = member.node_id
           GROUP BY member.root),
         ej AS (
           SELECT root,
             '[' || string_agg('{"source":' || src || ',"target":' || dst ||
               ',"label":"' || label || '"}', ',' ORDER BY src, dst, label) || ']' AS edges_json
           FROM reach GROUP BY root)
         SELECT nj.root,
           '{"nodes":' || nj.nodes_json || ',"edges":' || ej.edges_json || '}' AS knowledge_graph
         FROM nj JOIN ej ON nj.root = ej.root""",
    "q57_asof_join" ->
      """WITH views AS (SELECT user_id, ts, max(event_id) AS view_id
           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         p AS (SELECT event_id AS purchase_id, user_id, ts
           FROM events WHERE event_type = 'purchase')
         SELECT p.purchase_id, p.user_id, v.view_id AS last_view_id
         FROM p ASOF LEFT JOIN views v
           ON p.user_id = v.user_id AND p.ts >= v.ts""",
    "q58_range_join" ->
      """SELECT e.event_id AS error_id, p.event_id AS purchase_id
         FROM events e JOIN events p
           ON e.user_id = p.user_id
          AND e.event_type = 'error' AND p.event_type = 'purchase'
          AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 300000000""",
    // PQ/ADC replica: deterministic rank-order codebooks, the same
    // -2·dot+|c|² scoring with ordered list_sum folds, ADC totals summed
    // in subspace order (list(... ORDER BY m) -> list_sum), exact rerank.
    "q82_pq_adc" ->
      """WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         samp AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v
           FROM ev WHERE vec_id < 16),
         ms AS (SELECT unnest(range(0, 8)) AS m),
         cwn AS (SELECT s.k, ms.m, s.v[ms.m*8+1 : ms.m*8+8] AS c,
             list_sum(list_transform(range(1, 9),
               i -> s.v[ms.m*8+i]*s.v[ms.m*8+i])) AS nsq
           FROM samp s CROSS JOIN ms),
         enc AS (SELECT vec_id, m, k AS code FROM (
             SELECT e.vec_id, cn.m, cn.k,
               row_number() OVER (PARTITION BY e.vec_id, cn.m ORDER BY
                 -2 * list_sum(list_transform(range(1, 9),
                   i -> e.v[cn.m*8+i]*cn.c[i])) + cn.nsq, cn.k) AS rn
             FROM ev e CROSS JOIN cwn cn) WHERE rn = 1),
         q AS (SELECT v AS qv FROM (
             SELECT v, row_number() OVER (ORDER BY vec_id) AS rn
             FROM ev WHERE vec_id < 16) WHERE rn = 1),
         lut AS (SELECT cn.m, cn.k,
             -2 * list_sum(list_transform(range(1, 9),
               i -> q.qv[cn.m*8+i]*cn.c[i])) + cn.nsq AS lv
           FROM cwn cn, q),
         adc AS (SELECT vec_id, list_sum(lvs) AS adc_score FROM (
             SELECT en.vec_id, list(l.lv ORDER BY en.m) AS lvs
             FROM enc en JOIN lut l ON l.m = en.m AND l.k = en.code
             GROUP BY en.vec_id)),
         cand AS (SELECT vec_id FROM (
             SELECT vec_id, row_number() OVER (ORDER BY adc_score, vec_id) AS rn
             FROM adc) WHERE rn <= 50),
         rer AS (SELECT e.vec_id,
             list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*q.qv[i]))
             / (sqrt(list_sum(list_transform(range(1, len(e.v)+1), i -> e.v[i]*e.v[i])))
              * sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*q.qv[i])))) AS cos
           FROM ev e JOIN cand USING (vec_id), q)
         SELECT vec_id, round(cos, 4) AS cosine_sim FROM rer
         ORDER BY cos DESC, vec_id LIMIT 10""",
    // Image round-trip: the decode must recover the encoded gray exactly,
    // so the oracle predicts it arithmetically.
    "q81_image_decode" ->
      """SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
         CAST(p_partkey * 10 % 256 AS INT) AS gray_decoded
         FROM part WHERE p_partkey < 24""",
    "q96_profile" ->
      """SELECT 'o_orderstatus' AS "column", count(*) AS n_rows,
           count(*) - count(o_orderstatus) AS n_nulls,
           count(DISTINCT o_orderstatus) AS n_distinct,
           CAST(min(o_orderstatus) AS VARCHAR) AS min_value,
           CAST(max(o_orderstatus) AS VARCHAR) AS max_value FROM orders
         UNION ALL
         SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           CAST(min(o_orderpriority) AS VARCHAR),
           CAST(max(o_orderpriority) AS VARCHAR) FROM orders
         UNION ALL
         SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR),
           CAST(max(o_custkey) AS VARCHAR) FROM orders
         UNION ALL
         SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate),
           CAST(min(o_orderdate) AS VARCHAR),
           CAST(max(o_orderdate) AS VARCHAR) FROM orders""",
    "q95_video_frames" ->
      """WITH v AS (SELECT CAST(p_partkey AS BIGINT) AS media_id,
             CAST(p_partkey % 4 + 2 AS INT) AS n_frames
           FROM part WHERE p_partkey < 24),
         f AS (SELECT media_id, n_frames,
             CAST(unnest(generate_series(0, n_frames - 1, 2)) AS INT) AS frame_idx
           FROM v)
         SELECT media_id, frame_idx, n_frames,
                CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
                CAST((media_id * 10 + frame_idx * 40) % 256 AS INT) AS gray_decoded
         FROM f""",
    "q91_audio_decode" ->
      """SELECT CAST(p_partkey AS BIGINT) AS media_id,
         CAST(8000 AS INT) AS sample_rate,
         CAST(50 + p_partkey % 10 AS BIGINT) AS n_samples,
         CAST(p_partkey * 7 % 120 + 1 AS DOUBLE) / 128.0 AS rms,
         CAST(49 + p_partkey % 10 AS BIGINT) AS zero_crossings
         FROM part WHERE p_partkey < 24""",
    // Sketch validation contract: the oracle's exact side plus the
    // always-TRUE error-bound flags the Spark side must reproduce.
    "q59_sketches" ->
      """SELECT l_returnflag,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
         TRUE AS approx_parts_ok, TRUE AS p50_ok
         FROM lineitem GROUP BY l_returnflag""",
    "q55_sql_view" ->
      """SELECT r_name AS region_name, c_mktsegment AS segment, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE o_orderstatus = 'F'
         GROUP BY r_name, c_mktsegment""",
    "q69_facet_view" ->
      """SELECT 'lang' AS facet_name,
         string_agg(DISTINCT lang, ',' ORDER BY lang) AS options,
         count(DISTINCT lang) AS n_options FROM documents
         UNION ALL
         SELECT 'source', string_agg(DISTINCT source, ',' ORDER BY source),
         count(DISTINCT source) FROM documents""",
    "q70_display_view" ->
      """SELECT l_orderkey, l_linenumber, p_name, s_name AS supplier_name,
         concat_ws('/', p_brand, p_type) AS brand_display, l_quantity
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE concat_ws('/', p_brand, p_type) LIKE 'Brand#3%'""",
    "q56_doc_stats_view" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens
         FROM documents GROUP BY lang""",
    "q79_overview_view" ->
      """SELECT n.n_name AS nation_name, count(1) AS n_orders
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY n.n_name""",
    "q115_data_overview_cohorts" ->
      """SELECT l.l_orderkey, l.l_linenumber, p.p_name AS symbol,
         n.n_name AS provider, c.c_mktsegment AS type,
         r.r_name AS cohort_system, l.l_quantity,
         round(log2(l.l_extendedprice + 0.001), 4) AS price_log
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name != 'AFRICA'
           AND p.p_name IN ('blue plate', 'red bolt', 'hot widget')""",
    "q80_facet_options_view" ->
      """WITH f AS (
           SELECT 'lang' AS facet_name,
             list_sort(list_distinct(list(lang))) AS options FROM documents
           UNION ALL
           SELECT 'source', list_sort(list_distinct(list(source)))
           FROM documents)
         SELECT facet_name, unnest(options) AS option FROM f"""
  )
}
