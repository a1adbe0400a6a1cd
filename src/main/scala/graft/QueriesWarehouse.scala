package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Ids, Redaction, Text, Vectors}
import graft.operators.{Dedup, Relational, Sampling, Similarity}
import QueryDsl._

/** Query registry, warehouse / BI / time-series tier — layout, sketches,
  * sessionization, reports, SCD/CDC, the q197-q203 audit family.
  *
  * Entries moved verbatim from SparkEntry (r7 registry split); the
  * contract — name -> (session, sfDir) -> DataFrame, every entry
  * oracle-checked — is unchanged and pinned by RegistrySpec.
  */
private[graft] object QueriesWarehouse {
  def map: Map[String, (SparkSession, String) => DataFrame] =
    baseMap ++ roundNine

  private def baseMap: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    "q73_salted_agg" -> ((s, dir) => {
      // Two-phase salted aggregation (skew path): partial counts per
      // (key, salt), then re-aggregate — same result as a plain groupBy,
      // but a hot key spreads over `salts` reducers.
      graft.operators.Skew.saltedCount(
        tbl(s, dir, "lineitem").select(col("l_returnflag")),
        "l_returnflag", salts = 16)
    }),

    "q96_profile" -> ((s, dir) =>
      // One-scan column profiler (Expand-planned multi-countDistinct):
      // the pre-curation "describe" pass. Doubles stay out of the
      // profile set — their string rendering is engine-specific; every
      // other type renders identically cross-engine.
      graft.operators.Profile.profile(
        tbl(s, dir, "orders"),
        Seq("o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate"))),

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
      // Pair stream via the capped wedge-join operator (cap off by
      // default: TPC-H baskets are ≤ 7 brands; a real corpus with hot
      // baskets sets maxWidth and reports Relational.overWidthKeys).
      val pairs = Relational.keyedPairs(items, "ok", "brand")
        .groupBy(col("brand_a"), col("brand_b"))
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
      val u = (graft.plans.TextKernels.unitHashNative(
        concat(col("segment"), lit("|"), col("nation"))) *
        lit(4294967296.0) + lit(0.5)) / lit(4294967296.0)
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
          // the exact DECIMAL converts to one IEEE double in both
          // engines; rounding it to 2 dp put scale-4 values like
          // .685 EXACTLY on the half boundary, where the engines'
          // rounding algorithms diverge (the r10 sf1 sweep's third
          // find — q133's boundary lesson on the money surface)
          col("rev").cast("double").as("revenue"))
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

    // ── KMV sketch: cross-engine EXACT distinct estimate (vs q59 HLL) ───
    "q75_kmv_sketch" -> ((s, dir) => {
      // Native TypedImperativeAggregate (primitive-buffer, no per-row
      // encoder round-trip); the typed-Aggregator form lives on in
      // AggregatorsSpec as the extension-point demo.
      val hv = graft.plans.TextKernels
        .unitHashNative(col("l_partkey").cast("string")).as("hv")
      tbl(s, dir, "lineitem").select(col("l_returnflag"), hv)
        .groupBy(col("l_returnflag"))
        .agg(graft.plans.SketchAggregates.kmvDistinct(col("hv"), 64)
          .as("distinct_est"))
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

    // ── r7 additions: resample / attribution / robust aggregation ───────
    "q205_gap_fill" -> ((s, dir) => {
      // Gap-fill + forward-fill resample: daily revenue onto a complete
      // day spine, missing days carrying the last observed value — the
      // time-series regularization every BI layer applies before window
      // math. Scale shape: the spine and the as-of fill join are
      // DATE-DOMAIN-sized (~2.4k days regardless of corpus rows), so
      // after the one day-keyed aggregate everything is broadcast-sized;
      // no unpartitioned window, no fact-table sort.
      val daily = tbl(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(col("o_totalprice").cast(dec)).cast("double").as("rev"))
      val spine = daily.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      // As-of backward lookup: the latest data day <= each spine day
      // (exact forward fill, bounded |days|² worst case — days, not rows).
      val filled = spine.join(broadcast(daily.select(col("d"))), col("d") <= col("day"))
        .groupBy(col("day")).agg(max(col("d")).as("src_day"))
      filled.join(broadcast(daily), col("src_day") === col("d"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("rev").as("rev_filled"),
          (col("src_day") =!= col("day")).as("is_gap"))
    }),

    "q206_attribution" -> ((s, dir) => {
      // First-touch / last-touch conversion attribution: each user's
      // FIRST purchase is attributed (a) to the first event of their
      // history and (b) to the last event strictly before that purchase.
      // All windows are user-partitioned (keys grow with the data — no
      // funnel), the two channel rollups are channel-sized, and the
      // deterministic tiebreak is (ts, event_id) everywhere.
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      val wAsc = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val fp = e.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(wAsc)).filter(col("rn") === 1)
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_id"), col("value").as("p_value"))
      val ft = e.withColumn("rn", row_number().over(wAsc)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("first_ch"))
      val before = e.join(fp, Seq("user_id"))
        .filter(col("ts") < col("p_ts") ||
          (col("ts") === col("p_ts") && col("event_id") < col("p_id")))
      val wDesc = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val lt = before.withColumn("rn", row_number().over(wDesc)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("last_ch"))
      val fta = ft.join(fp, Seq("user_id"))
        .groupBy(col("first_ch").as("channel"))
        .agg(count(lit(1)).as("n_first"),
          sum(col("p_value").cast(dec)).cast("double").as("val_first"))
      val lta = lt.groupBy(col("last_ch").as("channel"))
        .agg(count(lit(1)).as("n_last"))
      fta.join(lta, Seq("channel"), "full")
        .select(col("channel"),
          coalesce(col("n_first"), lit(0L)).as("n_first"),
          coalesce(col("val_first"), lit(0.0)).as("val_first"),
          coalesce(col("n_last"), lit(0L)).as("n_last"))
    }),

    "q209_weighted_median" -> ((s, dir) => {
      // Exact weighted median order price per customer, weight = the
      // order's lineitem count: sort within each customer (keys grow
      // with the data — well-partitioned per-key windows, never global),
      // integer cumulative weights (2·cumw ≥ totw is exact arithmetic,
      // no float boundary), and the qualifying suffix's min price IS the
      // weighted median, so the pick is a plain agg, not a second window.
      val items = tbl(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("w"))
      val o = tbl(s, dir, "orders")
        .join(items, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"), col("w"))
      val wv = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tw = Window.partitionBy(col("o_custkey"))
      o.withColumn("cumw", sum(col("w")).over(wv))
        .withColumn("totw", sum(col("w")).over(tw))
        .filter(col("cumw") * 2 >= col("totw"))
        .groupBy(col("o_custkey"))
        .agg(min(col("o_totalprice")).as("w_median"),
          max(col("totw")).as("total_weight"))
    }),

    "q213_ddsketch_quantiles" -> ((s, dir) => {
      // DDSketch relative-error quantiles as a RELATIONAL sketch
      // (operators.DdSketch): deterministic log-γ bucket counts are the
      // sketch state (mergeable by pure addition — the property the
      // streaming face needs and a t-digest can't give), extraction is
      // an exact-integer rank walk over the ≤600-bucket table, and the
      // oracle replays buckets + walk + midpoint estimate EXACTLY while
      // the α-bound flags prove the estimates sit within 2α of the
      // exact percentiles. The corpus is touched twice (sketch build,
      // exact-percentile contrast) and never window-sorted.
      import operators.DdSketch
      val li = tbl(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val b = DdSketch.buckets(li, "l_returnflag", "l_extendedprice")
      val p50 = DdSketch.quantileIdx(b, "l_returnflag", 1, 2, "i50")
      val p90 = DdSketch.quantileIdx(b, "l_returnflag", 9, 10, "i90")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5D)").as("e50"),
          expr("percentile(l_extendedprice, 0.9D)").as("e90"),
          count(lit(1)).as("n_rows"))
      exact.join(broadcast(p50), Seq("l_returnflag"))
        .join(broadcast(p90), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_rows"),
          DdSketch.estimate(col("i50")).as("p50_est"),
          DdSketch.estimate(col("i90")).as("p90_est"),
          (abs(DdSketch.estimate(col("i50")) - col("e50")) <= col("e50") * 0.02)
            .as("p50_ok"),
          (abs(DdSketch.estimate(col("i90")) - col("e90")) <= col("e90") * 0.02)
            .as("p90_ok"))
    }),

    "q218_retention_cohorts" -> ((s, dir) => {
      // Cohort-retention triangle: cohort = a customer's first order
      // month, offset = months since, cell = distinct active customers,
      // rate = cell / cohort size. Two custkey-partitioned shuffles (the
      // first-order min and the co-partitioned join back) and a
      // month²-bounded final aggregate; cohort sizes are the offset-0
      // diagonal, joined back broadcast. Month index is pure calendar
      // arithmetic (year·12+month−1) — no week conventions, identical in
      // both engines under the pinned UTC session.
      val o = tbl(s, dir, "orders").select(col("o_custkey").as("cust"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("bigint").as("m"))
      val first = o.groupBy(col("cust")).agg(min(col("m")).as("cohort_m"))
      val active = o.join(first, Seq("cust"))
        .select(col("cohort_m"), (col("m") - col("cohort_m")).as("offset_m"),
          col("cust"))
        .distinct()
      val counts = active.groupBy(col("cohort_m"), col("offset_m"))
        .agg(count(lit(1)).as("n_active")).localCheckpoint()
      val sizes = counts.filter(col("offset_m") === 0)
        .select(col("cohort_m"), col("n_active").as("cohort_size"))
      counts.join(broadcast(sizes), Seq("cohort_m"))
        .select(col("cohort_m"), col("offset_m"), col("n_active"),
          col("cohort_size"),
          round(col("n_active").cast("double") /
            col("cohort_size").cast("double"), 4).as("retention"))
    }),

    "q219_association_rules" -> ((s, dir) => {
      // Association rules over the q180 brand baskets: every frequent
      // unordered pair (relative support ≥ 0.5% of baskets, exact
      // integer compare) emits both directed rules with confidence
      // pc/c(ante) and lift pc·n/(c(ante)·c(cons)). The pair stream is
      // bounded by basket width (TPC-H ≤ 7 brands; a retail-width hot
      // basket is bounded by the same broadcast-L2 prune as q180); the
      // per-brand counts are brand-sized and ride broadcast. All counts
      // stay exact integers; each ratio is one double division.
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val items = li.join(p, li("l_partkey") === p("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .distinct().localCheckpoint()
      val totals = items.agg(countDistinct(col("ok")).as("n_baskets"))
      val c1 = items.groupBy(col("brand")).agg(count(lit(1)).as("c"))
      val pairs = items.as("x").join(items.as("y"),
          col("x.ok") === col("y.ok") && col("x.brand") < col("y.brand"))
        .groupBy(col("x.brand").as("pa"), col("y.brand").as("pb"))
        .agg(count(lit(1)).as("pc"))
        .crossJoin(broadcast(totals))
        .filter(col("pc") * 200 >= col("n_baskets"))
      val rules = pairs.select(col("pa").as("ante"), col("pb").as("cons"),
          col("pc"), col("n_baskets"))
        .union(pairs.select(col("pb").as("ante"), col("pa").as("cons"),
          col("pc"), col("n_baskets")))
      rules
        .join(broadcast(c1.select(col("brand").as("ante"), col("c").as("ca"))),
          Seq("ante"))
        .join(broadcast(c1.select(col("brand").as("cons"), col("c").as("cb"))),
          Seq("cons"))
        .select(col("ante"), col("cons"), col("pc").as("pair_n"),
          round(col("pc").cast("double") / col("ca").cast("double"), 4)
            .as("confidence"),
          round((col("pc") * col("n_baskets")).cast("double") /
            (col("ca") * col("cb")).cast("double"), 4).as("lift"))
    }),

    "q220_streak_islands" -> ((s, dir) => {
      // Gaps-and-islands: longest run of CONSECUTIVE active days per
      // user (day − row_number is constant within a run — the classic
      // islands key), reported as a histogram of longest-streak lengths.
      // The one window is partitioned by user_id — per-user day lists,
      // never a global sort — and every aggregate after it is
      // map-combinable. Day is integer epoch-day arithmetic (µs div
      // 86400e6), no calendar functions.
      val days = Tables.events(s, dir)
        .select(col("user_id"), expr("div(unix_micros(ts), 86400000000)").as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val streaks = days.withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
      streaks.groupBy(col("user_id")).agg(max(col("len")).as("streak_days"))
        .groupBy(col("streak_days")).agg(count(lit(1)).as("n_users"))
    }),

    "q221_ols_price_qty" -> ((s, dir) => {
      // Closed-form per-nation OLS of whole-dollar line price on
      // quantity from EXACT-INTEGER sufficient statistics (n, Σx, Σy,
      // Σxy, Σx², Σy²) — one map-combinable aggregate over the fact
      // table, two broadcast dim joins, then slope/intercept/R² as a
      // fixed IEEE double sequence over stats each < 2^53. y is the
      // whole-dollar price via exact cents (cast DECIMAL(18,2) · 100 →
      // BIGINT, then integer div 100), so every sum commutes — no
      // ordered folds, unlike the float path of q154. Σy² is the
      // magnitude bound: ~3·10¹⁵ per nation at sf1; beyond that the
      // same stats move to DECIMAL(38) partials with the identical
      // formula tail.
      val li = tbl(s, dir, "lineitem").select(col("l_suppkey"),
        col("l_quantity").cast("bigint").as("x"),
        expr("div(cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint), 100)")
          .as("y"))
      val sup = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val nat = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val m = li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(
          count(lit(1)).as("n_lines"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sx2"),
          sum(col("y") * col("y")).as("sy2"))
      def d(c: String): Column = col(c).cast("double")
      val den = d("n_lines") * d("sx2") - d("sx") * d("sx")
      val slope = (d("n_lines") * d("sxy") - d("sx") * d("sy")) / den
      m.select(col("n_name"), col("n_lines"),
        round(slope, 6).as("slope"),
        round((d("sy") - slope * d("sx")) / d("n_lines"), 4).as("intercept"),
        round((d("n_lines") * d("sxy") - d("sx") * d("sy")) *
          (d("n_lines") * d("sxy") - d("sx") * d("sy")) /
          (den * (d("n_lines") * d("sy2") - d("sy") * d("sy"))), 6).as("r2"))
    }),

    "q222_ab_value_ztest" -> ((s, dir) => {
      // Unpaired Welch z-test on mean purchase value per user under a
      // deterministic hash split (variant = user_id mod 2) — the A/B
      // readout an experimentation platform computes. (A two-proportion
      // conversion test is degenerate on this data: every user
      // converts, pooled variance 0.) Per-user spend folds as EXACT
      // INTEGER CENTS, so the user-level sufficient statistics (n, Σc,
      // Σc²) are order-free map-combinable bigints; means, variances,
      // and z are one fixed double sequence on the final 2-row rollup.
      val ev = Tables.events(s, dir)
      val spend = ev.filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("variant"), col("user_id"),
          expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"))
        .groupBy(col("variant"), col("user_id"))
        .agg(sum(col("cents")).as("cu"))
      val per = spend.groupBy(col("variant")).agg(
        count(lit(1)).as("n"), sum(col("cu")).as("s1"),
        sum(col("cu") * col("cu")).as("s2"))
      val one = per.agg(
        max(when(col("variant") === 0, col("n"))).as("n0"),
        max(when(col("variant") === 0, col("s1"))).as("a1"),
        max(when(col("variant") === 0, col("s2"))).as("a2"),
        max(when(col("variant") === 1, col("n"))).as("n1"),
        max(when(col("variant") === 1, col("s1"))).as("b1"),
        max(when(col("variant") === 1, col("s2"))).as("b2"))
      def d(c: String): Column = col(c).cast("double")
      val m0 = d("a1") / d("n0")
      val m1 = d("b1") / d("n1")
      val v0 = (d("a2") - d("a1") * d("a1") / d("n0")) / (d("n0") - lit(1.0))
      val v1 = (d("b2") - d("b1") * d("b1") / d("n1")) / (d("n1") - lit(1.0))
      val z = (m1 - m0) / sqrt(v0 / d("n0") + v1 / d("n1"))
      one.select(col("n0"), col("n1"),
        round(m0 / lit(100.0), 4).as("mean0"),
        round(m1 / lit(100.0), 4).as("mean1"),
        round(z, 4).as("z_stat"), (abs(round(z, 4)) > 1.96).as("significant"))
    }),

    "q223_benford_digits" -> ((s, dir) => {
      // Benford first-digit audit of order totals: observed leading
      // digit counts vs log10(1+1/d) expectation with per-digit χ²
      // contributions. The digit comes from the STRING form of exact
      // integer cents (both engines render BIGINT identically; ×100
      // never changes the leading digit), so the whole query is one
      // map-combinable 9-group count plus a broadcast total — a single
      // fact-table scan at any scale.
      val digit = substring(
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
          .cast("string"), 1, 1)
      val obs = tbl(s, dir, "orders").select(digit.as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
        .localCheckpoint()
      val tot = obs.agg(sum(col("n_obs")).as("n"))
      val expP = log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
      val expN = col("n").cast("double") * expP
      obs.crossJoin(broadcast(tot))
        .select(col("digit"), col("n_obs"),
          round(expP, 6).as("exp_p"),
          round((col("n_obs").cast("double") - expN) *
            (col("n_obs").cast("double") - expN) / expN, 4).as("chi2_part"))
    }),

    "q226_holt_forecast" -> ((s, dir) => {
      // Holt double-exponential smoothing (α=0.3, β=0.2) of the daily
      // event count with a 7-day-ahead forecast. The recurrence is
      // inherently sequential, so it folds over the DAY-BOUNDED series
      // (the only corpus-shaped step is the map-combinable per-day
      // count; the fold input is calendar-sized at any corpus scale).
      // Level and trend round to 6 dp at every step — the same
      // fixed-point discipline as q189 — so the DuckDB recursive-CTE
      // replay of the identical recurrence is bit-equal.
      val daily = Tables.events(s, dir)
        .select(expr("div(unix_micros(ts), 86400000000)").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).cast("double").as("x"))
      val ser = daily
        .agg(array_sort(collect_list(struct(col("day"), col("x")))).as("ser"))
      val zero = struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(0L).as("t"))
      ser.select(aggregate(col("ser"), zero,
        (acc, e) => {
          val x = e.getField("x")
          val l1 = when(acc.getField("t") === 0, round(x, 6))
            .otherwise(round(lit(0.3) * x +
              lit(0.7) * (acc.getField("l") + acc.getField("b")), 6))
          val b1 = when(acc.getField("t") === 0, lit(0.0))
            .otherwise(round(lit(0.2) * (l1 - acc.getField("l")) +
              lit(0.8) * acc.getField("b"), 6))
          struct(l1.as("l"), b1.as("b"), (acc.getField("t") + 1).as("t"))
        },
        acc => struct(acc.getField("t").as("n_days"),
          acc.getField("l").as("level"), acc.getField("b").as("trend"),
          round(acc.getField("l") + lit(7.0) * acc.getField("b"), 4)
            .as("forecast_7"))).as("r"))
        .select(col("r.n_days"), col("r.level"), col("r.trend"),
          col("r.forecast_7"))
    }),

    "q228_chi2_independence" -> ((s, dir) => {
      // Pearson χ² independence test of order priority × status: one
      // map-combinable cell count (|priorities|·|statuses| cells at any
      // scale), margins re-aggregated from the CELLS (never a second
      // corpus scan) and joined back broadcast. Expected counts and the
      // per-cell χ² contributions are one fixed double sequence over
      // exact integers.
      val cells = tbl(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"), col("o_orderstatus").as("status"))
        .groupBy(col("prio"), col("status")).agg(count(lit(1)).as("n_obs"))
        .localCheckpoint()
      val rowm = cells.groupBy(col("prio")).agg(sum(col("n_obs")).as("rt"))
      val colm = cells.groupBy(col("status")).agg(sum(col("n_obs")).as("ct"))
      val tot = cells.agg(sum(col("n_obs")).as("n"))
      val e = col("rt").cast("double") * col("ct").cast("double") /
        col("n").cast("double")
      cells.join(broadcast(rowm), Seq("prio"))
        .join(broadcast(colm), Seq("status"))
        .crossJoin(broadcast(tot))
        .select(col("prio"), col("status"), col("n_obs"),
          round(e, 4).as("exp_n"),
          round((col("n_obs").cast("double") - e) *
            (col("n_obs").cast("double") - e) / e, 4).as("chi2_part"))
    }),

    "q229_hill_tail_index" -> ((s, dir) => {
      // Hill maximum-likelihood tail index of the orders-per-customer
      // distribution (α = 1 + n/Σln(dᵢ/dmin) over the dᵢ ≥ dmin tail) —
      // the power-law diagnostic run on degree/frequency distributions.
      // The corpus collapses to the DEGREE GRID first (one groupBy
      // chain), so the ln terms — rounded to 6 dp and folded in degree
      // order, the q149 float contract — see a domain-bounded input at
      // any scale.
      val deg = tbl(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("d"))
      val grid = deg.filter(col("d") >= 10)
        .groupBy(col("d")).agg(count(lit(1)).as("cnt"))
      val sums = grid.agg(sum(col("cnt")).as("n_tail"),
        aggregate(array_sort(collect_list(struct(col("d"),
          round(col("cnt").cast("double") *
            log(col("d").cast("double") / lit(10.0)), 6).as("term")))),
          lit(0.0), (a, e) => a + e.getField("term")).as("s"))
      sums.select(col("n_tail"), lit(10L).as("d_min"),
        round(lit(1.0) + col("n_tail").cast("double") / col("s"), 4).as("alpha"))
    }),

    "q230_bootstrap_ci" -> ((s, dir) => {
      // Poisson-bootstrap confidence interval for the mean order total:
      // 32 resamples where row i enters resample b with multiplicity
      // drawn by inverse-CDF of Poisson(1) from the md5(orderkey·b)
      // unit hash (the q88 idiom — deterministic, replayable on any
      // engine, no RNG state). Each resample mean folds as EXACT cents
      // (Σ m·cents / Σ m), so the 32 means are bit-equal cross-engine;
      // the 2.5/97.5% envelope uses the q65 interpolated-percentile
      // contract. Scale shape: a 32× flat-map of one scan, zero
      // corpus-keyed shuffles — the aggregate is 32 groups.
      val o = tbl(s, dir, "orders").select(col("o_orderkey"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
          .as("cents"))
      val rep = o.select(col("o_orderkey"), col("cents"),
        explode(sequence(lit(0), lit(31))).as("b"))
      val u = graft.plans.TextKernels.unitHashNative(
        concat(col("o_orderkey").cast("string"), lit("_"), col("b").cast("string")))
      // Poisson(1) CDF cut points: P(0)=e⁻¹, P(≤1), P(≤2); tail mass → 3.
      val m = when(u < 0.36787944117144233, 0L)
        .when(u < 0.7357588823428847, 1L)
        .when(u < 0.9196986029286058, 2L).otherwise(3L)
      val means = rep.select(col("b"), col("cents"), m.as("m"))
        .groupBy(col("b"))
        .agg((sum(col("m") * col("cents")).cast("double") /
          sum(col("m")).cast("double") / lit(100.0)).as("mean_b"))
      val full = o.agg((sum(col("cents")).cast("double") /
        count(lit(1)).cast("double") / lit(100.0)).as("mean_full"))
      means.agg(count(lit(1)).as("n_boot"),
          round(percentile(col("mean_b"), lit(0.025)), 4).as("ci_lo"),
          round(percentile(col("mean_b"), lit(0.975)), 4).as("ci_hi"))
        .crossJoin(broadcast(full))
        .select(col("n_boot"), col("ci_lo"), col("ci_hi"),
          round(col("mean_full"), 4).as("mean_full"))
    }),

    "q231_ordered_funnel" -> ((s, dir) => {
      // Strictly-ordered four-step funnel (view → click → signup →
      // purchase): a user counts for step k only with an event AFTER
      // their step-(k−1) time. Four user-keyed min-aggregates chained by
      // co-partitioned joins — each stage is map-combinable and the key
      // never changes, so at scale this is one shuffle's partitioning
      // reused four times. Counts are exact; step rates are one double
      // division each.
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      def step(prev: DataFrame, prevT: String, evType: String, outT: String) =
        ev.filter(col("event_type") === evType)
          .join(prev, Seq("user_id"))
          .filter(col("us") > col(prevT))
          .groupBy(col("user_id")).agg(min(col("us")).as(outT))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val t2 = step(t1, "t1", "click", "t2")
      val t3 = step(t2, "t2", "signup", "t3")
      val t4 = step(t3, "t3", "purchase", "t4")
      t1.agg(count(lit(1)).as("n_view"))
        .crossJoin(t2.agg(count(lit(1)).as("n_click")))
        .crossJoin(t3.agg(count(lit(1)).as("n_signup")))
        .crossJoin(t4.agg(count(lit(1)).as("n_purchase")))
        .select(col("n_view"), col("n_click"), col("n_signup"),
          col("n_purchase"),
          round(col("n_click").cast("double") / col("n_view").cast("double"), 4)
            .as("r_click"),
          round(col("n_signup").cast("double") / col("n_click").cast("double"), 4)
            .as("r_signup"),
          round(col("n_purchase").cast("double") / col("n_signup").cast("double"), 4)
            .as("r_purchase"),
          round(col("n_purchase").cast("double") / col("n_view").cast("double"), 4)
            .as("r_overall"))
    }),

    "q232_wallet_balance" -> ((s, dir) => {
      // Floor-clamped running balance (wallet: signup credits 100.00,
      // purchases debit, balance never goes below zero). The recursion
      // b_t = max(0, b_{t-1} + d_t) looks sequential, but has the
      // drawdown closed form b_t = cum_t − min(0, runmin(cum_t)) — so
      // it stays TWO USER-PARTITIONED WINDOWS over exact integer cents,
      // never a per-user sequential fold; the final row per user is a
      // map-combinable max-of-struct. The one double division happens
      // per user at the end.
      val d = Tables.events(s, dir)
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
          when(col("event_type") === "signup", lit(10000L))
            .otherwise(-expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
            .as("delta"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = d.withColumn("cum", sum(col("delta")).over(w))
      val b = c.withColumn("bal",
        col("cum") - least(lit(0L), min(col("cum")).over(w)))
      b.groupBy(col("user_id"))
        .agg(max(struct(col("us"), col("event_id"), col("bal"))).as("m"))
        .select(col("user_id"),
          (col("m.bal").cast("double") / lit(100.0)).as("final_balance"))
    }),

    "q233_truncated_mean" -> ((s, dir) => {
      // Robust (10/90-truncated) mean per return flag: values strictly
      // inside the interpolated p10/p90 bounds (the q65 percentile
      // contract) are averaged as EXACT INTEGER CENTS — rows are kept
      // or dropped whole, so unlike a winsorized clamp no fractional
      // boundary values enter the sum and the mean stays an order-free
      // bigint/bigint division. Two passes over the fact table: the
      // per-group percentile pair (flag-sized, broadcast back) and one
      // filtered map-combinable sum. The exact-percentile buffer is the
      // test-scale face; q213's DDSketch bounds are the documented
      // 100 TB knob for the same two-pass shape.
      val li = tbl(s, dir, "lineitem").select(col("l_returnflag"),
        expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)")
          .as("cents"))
        // Checkpointed (r13): feeds both the percentile-bounds pass and
        // the filtered sum — one scan + cents cast, not two.
        .localCheckpoint()
      val bounds = li.groupBy(col("l_returnflag")).agg(
        percentile(col("cents"), lit(0.1)).as("lo"),
        percentile(col("cents"), lit(0.9)).as("hi"))
      li.join(broadcast(bounds), Seq("l_returnflag"))
        .filter(col("cents").cast("double") > col("lo") &&
          col("cents").cast("double") < col("hi"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_kept"), sum(col("cents")).as("sc"),
          max(col("lo")).as("lo"), max(col("hi")).as("hi"))
        .select(col("l_returnflag"), col("n_kept"),
          round(col("lo") / lit(100.0), 4).as("p10"),
          round(col("hi") / lit(100.0), 4).as("p90"),
          round(col("sc").cast("double") / col("n_kept").cast("double") /
            lit(100.0), 4).as("truncated_mean"))
    }),

    "q235_spearman_rho" -> ((s, dir) => {
      // Spearman rank correlation between a customer's order count and
      // total spend. Ranks are tie-averaged and DOUBLED (2·r = integer),
      // so the whole Pearson-on-ranks tail runs on exact bigints — the
      // ×2 cancels in ρ. The order-count grid is domain-bounded; the
      // near-unique spend ranks ride the banded two-pass cumsum
      // (ScalableWindow.bandedCumSum — no unpartitioned window over the
      // customer aggregate, the q203/q204 contract). Σ(2r)² ≈ 4n³ caps
      // the bigint path at ~10⁶ customers; past that the same sums move
      // to DECIMAL(38) partials.
      val base = tbl(s, dir, "orders").groupBy(col("o_custkey")).agg(
        count(lit(1)).as("x"),
        sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"))
          .as("y")).localCheckpoint()
      def ranks(c: String): DataFrame = {
        val grid = base.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        operators.ScalableWindow
          .bandedCumSum(grid, c, descending = false, Nil, "cnt", "cum")
          .select(col(c),
            (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
              .as(s"r2$c"))
      }
      val r = base.join(ranks("x"), Seq("x")).join(ranks("y"), Seq("y"))
      val m = r.agg(count(lit(1)).as("n"),
        sum(col("r2x")).as("sx"), sum(col("r2y")).as("sy"),
        sum(col("r2x") * col("r2y")).as("sxy"),
        sum(col("r2x") * col("r2x")).as("sx2"),
        sum(col("r2y") * col("r2y")).as("sy2"))
      def d(c: String): Column = col(c).cast("double")
      m.select(col("n").as("n_cust"),
        round((d("n") * d("sxy") - d("sx") * d("sy")) /
          (sqrt(d("n") * d("sx2") - d("sx") * d("sx")) *
           sqrt(d("n") * d("sy2") - d("sy") * d("sy"))), 6).as("rho"))
    }),

    "q236_kaplan_meier" -> ((s, dir) => {
      // Kaplan–Meier survival curve for view→purchase latency with
      // right-censoring at last activity — the clinical estimator the
      // reference's domain (patient-derived cancer models) reports on.
      // Per-user times are two user-keyed min/max aggregates; the
      // estimator itself lives entirely on the DAY GRID (integer day
      // offsets — calendar-bounded at any corpus size): at-risk counts
      // from running sums over the grid, and the survival product folds
      // per event day over the grid's triangular join (the q189 shape)
      // with an 8-dp fixed-point per step, replayed exactly by the
      // oracle's list_reduce.
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val t0 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
      val firstP = ev.filter(col("event_type") === "purchase")
        .join(t0, Seq("user_id")).filter(col("us") > col("t0"))
        .groupBy(col("user_id")).agg(min(col("us")).as("tp"))
      val lastAny = ev.join(t0, Seq("user_id"))
        .groupBy(col("user_id")).agg(max(col("us")).as("tl"))
      val times = t0.join(firstP, Seq("user_id"), "left")
        .join(lastAny, Seq("user_id"))
        .select(col("user_id"),
          when(col("tp").isNotNull, expr("div(tp - t0, 86400000000)"))
            .otherwise(expr("div(tl - t0, 86400000000)")).as("day"),
          col("tp").isNotNull.as("is_event"))
        .localCheckpoint()
      val nTot = times.agg(count(lit(1)).as("ntot"))
      val grid = times.groupBy(col("day")).agg(
        sum(when(col("is_event"), 1L).otherwise(0L)).as("d"),
        sum(when(col("is_event"), 0L).otherwise(1L)).as("c"))
      val cum = operators.ScalableWindow.boundedRankCum(grid,
        Seq(("day", true)), "t", Seq(("d", "cumd"), ("c", "cumc")))
        .crossJoin(broadcast(nTot))
        .withColumn("n_risk",
          col("ntot") - (col("cumd") - col("d")) - (col("cumc") - col("c")))
        .withColumn("f",
          lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
        .localCheckpoint()
      val eventDays = cum.filter(col("d") > 0)
        .select(col("t"), col("day"), col("n_risk"), col("d"), col("f"))
      eventDays.as("b").join(eventDays.as("a"), col("a.t") <= col("b.t"))
        .groupBy(col("b.day").as("day"), col("b.n_risk").as("n_risk"),
          col("b.d").as("d_events"))
        .agg(aggregate(array_sort(collect_list(struct(col("a.t"),
            col("a.f").as("f")))), lit(1.0),
            (acc, e) => round(acc * e.getField("f"), 8)).as("surv"))
    }),

    "q237_logrank_test" -> ((s, dir) => {
      // Log-rank test comparing view→purchase survival between the two
      // hash-split cohorts (user mod 2) on the q236 survival table:
      // χ² = (Σ(d₀−E₀))²/ΣV with the hypergeometric per-day variance.
      // Same scale shape as q236 — user-keyed aggregates, then the whole
      // test statistic on the day grid (per-group at-risk counts from
      // running sums; the two fold sums run day-ordered per the float
      // contract).
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val t0 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
      val firstP = ev.filter(col("event_type") === "purchase")
        .join(t0, Seq("user_id")).filter(col("us") > col("t0"))
        .groupBy(col("user_id")).agg(min(col("us")).as("tp"))
      val lastAny = ev.join(t0, Seq("user_id"))
        .groupBy(col("user_id")).agg(max(col("us")).as("tl"))
      val times = t0.join(firstP, Seq("user_id"), "left")
        .join(lastAny, Seq("user_id"))
        .select((col("user_id") % 2).as("g"),
          when(col("tp").isNotNull, expr("div(tp - t0, 86400000000)"))
            .otherwise(expr("div(tl - t0, 86400000000)")).as("day"),
          col("tp").isNotNull.as("is_event"))
      val grid = times.groupBy(col("day")).agg(
        sum(when(col("is_event") && col("g") === 0, 1L).otherwise(0L)).as("d0"),
        sum(when(col("is_event") && col("g") === 1, 1L).otherwise(0L)).as("d1"),
        sum(when(!col("is_event") && col("g") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(!col("is_event") && col("g") === 1, 1L).otherwise(0L)).as("c1"))
      val tot = grid.agg(sum(col("d0") + col("c0")).as("m0"),
        sum(col("d1") + col("c1")).as("m1"))
      val cum = operators.ScalableWindow.boundedRankCum(grid,
        Seq(("day", true)), "t",
        Seq(("d0", "cd0"), ("d1", "cd1"), ("c0", "cc0"), ("c1", "cc1")))
        .crossJoin(broadcast(tot))
        .withColumn("n0", col("m0") - (col("cd0") - col("d0")) -
          (col("cc0") - col("c0")))
        .withColumn("n1", col("m1") - (col("cd1") - col("d1")) -
          (col("cc1") - col("c1")))
        .withColumn("d", col("d0") + col("d1"))
        .withColumn("n", col("n0") + col("n1"))
        .filter(col("d") > 0 && col("n") > 1)
      def dd(c: String): Column = col(c).cast("double")
      val terms = cum.select(col("t"),
        (dd("d0") - dd("d") * dd("n0") / dd("n")).as("oe"),
        (dd("d") * (dd("n0") / dd("n")) * (dd("n1") / dd("n")) *
          (dd("n") - dd("d")) / (dd("n") - lit(1.0))).as("v"))
      def fold(c: Column): Column =
        aggregate(array_sort(collect_list(struct(col("t"), c.as("e")))),
          lit(0.0), (a, r) => a + r.getField("e"))
      terms.agg(count(lit(1)).as("n_event_days"),
          fold(round(col("oe"), 8)).as("soe"), fold(round(col("v"), 8)).as("sv"))
        .select(col("n_event_days"),
          round(col("soe"), 4).as("observed_minus_expected"),
          round(col("soe") * col("soe") / col("sv"), 4).as("chi2"))
    }),

    "q238_time_decay_attribution" -> ((s, dir) => {
      // Time-decay multi-touch attribution (half-life 1 day): every
      // touchpoint before a user's first purchase earns weight
      // 0.5^(Δdays), each user's credit is normalized to 1 and split
      // across channels, and channels sum the per-user shares. Weights
      // and shares round to 8 dp at creation; the per-user norm folds
      // user-locally (bounded lists) and the channel totals fold in
      // (user, us, event_id) order — the q154 float contract, whose
      // order-free variant is the documented 100 TB knob.
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"), col("event_id"))
      val conv = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("us")).as("tc"))
      val touches = ev.join(conv, Seq("user_id"))
        .filter(col("us") < col("tc") && col("event_type") =!= "purchase")
        .withColumn("w", round(pow(lit(0.5),
          (col("tc") - col("us")).cast("double") / lit(86400000000.0)), 8))
      val norms = touches.groupBy(col("user_id")).agg(
        aggregate(array_sort(collect_list(struct(col("us"), col("event_id"),
          col("w").as("w")))), lit(0.0),
          (a, e) => a + e.getField("w")).as("norm"))
      touches.join(norms, Seq("user_id"))
        .withColumn("share", round(col("w") / col("norm"), 8))
        .groupBy(col("event_type").as("channel"))
        .agg(count(lit(1)).as("n_touches"),
          round(aggregate(array_sort(collect_list(struct(col("user_id"),
            col("us"), col("event_id"), col("share").as("share")))), lit(0.0),
            (a, e) => a + e.getField("share")), 4).as("credit"))
    }),

    "q239_conversion_paths" -> ((s, dir) => {
      // Top converting paths: each converted user's last ≤4 touchpoint
      // types before first purchase, joined "->", counted, top 10 by
      // (count desc, path asc) — a TakeOrderedAndProject tail, never a
      // global sort. Per-user path assembly is a bounded user-local
      // ordered collect (the Sessionizer batch contract); everything
      // after is a path-type-bounded count.
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"), col("event_id"))
      val conv = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("us")).as("tc"))
      val paths = ev.join(conv, Seq("user_id"))
        .filter(col("us") < col("tc") && col("event_type") =!= "purchase")
        .groupBy(col("user_id"))
        .agg(transform(array_sort(collect_list(struct(col("us"),
          col("event_id"), col("event_type").as("et")))),
          e => e.getField("et")).as("seq"))
        .select(array_join(slice(col("seq"),
          greatest(size(col("seq")) - 3, lit(1)), lit(4)), "->").as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path")).limit(10)
    }),

    "q240_cohort_ltv" -> ((s, dir) => {
      // Cohort LTV curve: cumulative spend per cohort member by month
      // offset — the revenue companion to q218's retention triangle.
      // Spend stays exact integer cents through the per-(cohort, offset)
      // rollup AND the cumulative window (partitioned by cohort over the
      // month²-bounded grid — never corpus rows); one double division
      // per output row at the end.
      val o = tbl(s, dir, "orders").select(col("o_custkey").as("cust"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("bigint").as("m"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
          .as("cents"))
      val first = o.groupBy(col("cust")).agg(min(col("m")).as("cohort_m"))
      val base = o.join(first, Seq("cust"))
        .select(col("cohort_m"), (col("m") - col("cohort_m")).as("offset_m"),
          col("cust"), col("cents"))
        .localCheckpoint()
      val sizes = base.filter(col("offset_m") === 0)
        .groupBy(col("cohort_m")).agg(countDistinct(col("cust")).as("sz"))
      val grid = base.groupBy(col("cohort_m"), col("offset_m"))
        .agg(sum(col("cents")).as("sp"))
      val w = Window.partitionBy(col("cohort_m")).orderBy(col("offset_m"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // Floor-to-cent per-user LTV: cum/sz can land EXACTLY on a 4-dp
      // rounding tie (cents are exact and sz often divides them), where
      // HALF_UP (Spark) and half-even (DuckDB) disagree — integer cent
      // division has no tie to disagree on.
      grid.withColumn("cum", sum(col("sp")).over(w))
        .join(broadcast(sizes), Seq("cohort_m"))
        .select(col("cohort_m"), col("offset_m"),
          (expr("div(cum, sz)").cast("double") / lit(100.0))
            .as("ltv_per_user"))
    }),

    "q241_recursive_closure" -> ((s, dir) => {
      // The ancestor closure through Spark 4's native WITH RECURSIVE
      // (UnionLoopExec) — the one query surface the engine hadn't
      // exercised, on the reference's actual recursive workload (the
      // ontology/lineage closure q68 computes with the iterative
      // operator). One SQL template (QueryDsl.recursiveClosureSql) runs
      // verbatim in both engines; iterations = tree depth (11), each a
      // frontier⋈edges hash join — UnionLoop's per-iteration scheduling
      // floor is the cost model, the same depth bound as the
      // graph-tier's iterative operators.
      tbl(s, dir, "part").createOrReplaceTempView("q241_part")
      s.sql(recursiveClosureSql("q241_part", "div"))
    }),

    "q242_fifo_allocation" -> ((s, dir) => {
      // FIFO lot allocation — the classically "sequential" matching of
      // outflows (purchases) against inflow lots (signup credits of
      // 100.00) in arrival order, rewritten declaratively: cumulative
      // cents give every lot and purchase a half-open interval on the
      // user's credit number line, and FIFO matching IS interval
      // overlap — a user-keyed equi-join with a range predicate, never
      // a per-user loop. Windows are user-partitioned; all quantities
      // stay exact integer cents; the two divisions at the end are
      // exact (cents < 2^53).
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"), col("event_id"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lots = ev.filter(col("event_type") === "signup")
        .withColumn("amt", lit(10000L))
        .withColumn("hi", sum(col("amt")).over(w))
        .select(col("user_id"), (col("hi") - col("amt")).as("in_lo"),
          col("hi").as("in_hi"))
      val outs = ev.filter(col("event_type") === "purchase")
        .withColumn("hi", sum(col("cents")).over(w))
        .select(col("user_id"), (col("hi") - col("cents")).as("out_lo"),
          col("hi").as("out_hi"), col("cents"))
      val matched = lots.join(outs, Seq("user_id"))
        .filter(col("in_lo") < col("out_hi") && col("out_lo") < col("in_hi"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("nm"),
          sum(least(col("in_hi"), col("out_hi")) -
            greatest(col("in_lo"), col("out_lo"))).as("mc"))
      val totals = outs.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("pc"))
      val nLots = lots.groupBy(col("user_id")).agg(count(lit(1)).as("n_lots"))
      totals.join(nLots, Seq("user_id"), "left")
        .join(matched, Seq("user_id"), "left")
        .select(col("user_id"),
          coalesce(col("n_lots"), lit(0L)).as("n_lots"), col("n_purchases"),
          coalesce(col("nm"), lit(0L)).as("n_matches"),
          (coalesce(col("mc"), lit(0L)).cast("double") / lit(100.0))
            .as("funded"),
          ((col("pc") - coalesce(col("mc"), lit(0L))).cast("double") /
            lit(100.0)).as("unfunded"))
    }),

    "q244_diff_in_diff" -> ((s, dir) => {
      // Difference-in-differences: purchase-value change across the
      // dataset's calendar midpoint, treatment = the user_id mod 2 hash
      // split — the quasi-experimental readout layered on the q222
      // machinery. The period cutoff is pure integer day arithmetic
      // from the data's own bounds (broadcast, 1 row); the four cell
      // means come from one map-combinable exact-cents rollup folded to
      // a single row; DiD is one fixed double sequence.
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
        expr("div(unix_micros(ts), 86400000000)").as("day"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"))
      val bounds = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val cells = ev.filter(col("event_type") === "purchase")
        .crossJoin(broadcast(bounds))
        .select((col("user_id") % 2).as("g"),
          (col("day") > col("mn") + expr("div(mx - mn, 2)")).as("post"),
          col("cents"))
        .groupBy(col("g"), col("post"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      def cell(g: Int, post: Boolean, c: String): Column =
        max(when(col("g") === g && col("post") === post, col(c)))
      val one = cells.agg(
        cell(0, post = false, "sc").as("s00"), cell(0, post = false, "n").as("n00"),
        cell(0, post = true, "sc").as("s01"), cell(0, post = true, "n").as("n01"),
        cell(1, post = false, "sc").as("s10"), cell(1, post = false, "n").as("n10"),
        cell(1, post = true, "sc").as("s11"), cell(1, post = true, "n").as("n11"))
      def m(sc: String, n: String): Column =
        col(sc).cast("double") / col(n).cast("double") / lit(100.0)
      one.select(
        round(m("s00", "n00"), 4).as("ctrl_pre"),
        round(m("s01", "n01"), 4).as("ctrl_post"),
        round(m("s10", "n10"), 4).as("treat_pre"),
        round(m("s11", "n11"), 4).as("treat_post"),
        round((m("s11", "n11") - m("s10", "n10")) -
          (m("s01", "n01") - m("s00", "n00")), 4).as("did_estimate"))
    }),

    "q246_l_diversity" -> ((s, dir) => {
      // l-diversity audit (l=3) on the q168 quasi-identifier: a QI group
      // is safe only if its members span ≥3 distinct sensitive values
      // (account-balance band) — k-anonymity's fix for the homogeneity
      // attack. One broadcast dim join + one map-combinable
      // (QI, band)-bounded aggregate; the distinct count re-aggregates
      // the band grid, never the corpus.
      val c = tbl(s, dir, "customer").select(col("c_mktsegment"),
        col("c_nationkey"),
        when(col("c_acctbal").cast(dec) < 0, 0L)
          .when(col("c_acctbal").cast(dec) < 3000, 1L)
          .when(col("c_acctbal").cast(dec) < 7000, 2L).otherwise(3L)
          .as("band"))
      val n = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("n_name").as("nation"),
          col("band"))
        .agg(count(lit(1)).as("bn"))
        .groupBy(col("segment"), col("nation"))
        .agg(sum(col("bn")).as("n"), count(lit(1)).as("n_sensitive"))
        .select(col("segment"), col("nation"), col("n"), col("n_sensitive"),
          (col("n_sensitive") >= 3).as("l3_ok"))
    }),

    "q247_t_closeness" -> ((s, dir) => {
      // t-closeness (t=0.2) on the same QI/sensitive pair: the ordinal
      // earth-mover's distance between each group's balance-band
      // distribution and the global one, D = Σ|cum diffs|/(m−1). Four
      // fixed bands ⇒ the whole distance is an EXPLICIT column
      // expression over conditional counts (no folds, no collects);
      // the global distribution rides broadcast.
      val c = tbl(s, dir, "customer").select(col("c_mktsegment"),
        col("c_nationkey"),
        when(col("c_acctbal").cast(dec) < 0, 0L)
          .when(col("c_acctbal").cast(dec) < 3000, 1L)
          .when(col("c_acctbal").cast(dec) < 7000, 2L).otherwise(3L)
          .as("band"))
      val nat = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      def bandCount(b: Int): Column =
        sum(when(col("band") === b, 1L).otherwise(0L)).as(s"c$b")
      val g = c.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("n"), bandCount(0), bandCount(1), bandCount(2),
          bandCount(3))
        .localCheckpoint()
      val tot = g.agg(sum(col("n")).as("tn"), sum(col("c0")).as("t0"),
        sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
      def p(c: String, n: String): Column = col(c).cast("double") / col(n).cast("double")
      val cum1 = p("c0", "n") - p("t0", "tn")
      val cum2 = cum1 + (p("c1", "n") - p("t1", "tn"))
      val cum3 = cum2 + (p("c2", "n") - p("t2", "tn"))
      val dist = round((abs(cum1) + abs(cum2) + abs(cum3)) / lit(3.0), 6)
      g.crossJoin(broadcast(tot))
        .select(col("segment"), col("nation"), col("n"),
          dist.as("t_dist"), (dist <= 0.2).as("t_ok"))
    }),

    "q257_acf" -> ((s, dir) => {
      // Sample autocorrelation of the daily revenue series at lags 1..7.
      // The series lives on the DAY GRID (calendar-bounded at any corpus
      // size); the grid index comes from the triangular-join rank (no
      // global window), and every sum in the estimator is EXACT (cents
      // as DECIMAL(38,0), products likewise), so the only float ops are
      // the final closed-form divisions — order-free, bit-equal
      // cross-engine. acf_l = (S12 − x̄(S1+S2) + (n−l)x̄²)/(Sxx − n x̄²).
      val daily = tbl(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"))
          .cast("decimal(38,0)").as("x"))
      val idx = operators.ScalableWindow
        .boundedRankCum(daily, Seq(("day", true)), "t")
        .select(col("t"), col("x"))
        .localCheckpoint()
      val glob = idx.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      val lags = s.range(1, 8).select(col("id").as("lag"))
      val pairs = idx.as("a").crossJoin(broadcast(lags))
        .join(idx.as("b"), col("a.t") + col("lag") === col("b.t"))
        .groupBy(col("lag"))
        .agg(sum(col("a.x")).as("s1"), sum(col("b.x")).as("s2"),
          sum(col("a.x") * col("b.x")).as("s12"), count(lit(1)).as("nl"))
      def d(c: String): Column = col(c).cast("double")
      pairs.crossJoin(broadcast(glob))
        .withColumn("xb", d("sx") / d("n"))
        .select(col("lag"),
          round((d("s12") - col("xb") * (d("s1") + d("s2"))
              + d("nl") * (col("xb") * col("xb")))
            / (d("sxx") - d("n") * (col("xb") * col("xb"))), 6).as("acf"))
    }),

    "q258_wilson_lcb" -> ((s, dir) => {
      // Wilson lower confidence bound (z = 1.96) on per-brand return
      // rate — the ranking statistic that doesn't reward tiny samples
      // (a 1/1 returner ranks below a 40/100 one). Brand-bounded
      // aggregate of exact integer counts; the bound is one closed-form
      // double expression mirrored textually by the oracle.
      val j = tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("pos"))
      val nd = col("n").cast("double")
      val p = col("pos").cast("double") / nd
      val z2 = lit(1.96) * lit(1.96)
      j.select(col("brand"), col("n"), col("pos"),
        round((p + z2 / (lit(2.0) * nd)
            - lit(1.96) * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nd)) / nd))
          / (lit(1.0) + z2 / nd), 6).as("wilson_lcb"))
    }),

    "q259_auc_brier" -> ((s, dir) => {
      // Exact ROC-AUC via the rank-sum identity, WITHOUT a global sort:
      // ranks come from the banded two-pass cumsum (value-domain bands →
      // per-band partitioned window + broadcast band offsets — the
      // q203/q204 operator), so no unpartitioned window anywhere
      // (PlanSpec-gated). Scores are md5-unit hashes (tie-free), labels
      // are the return flag; Brier error folds as EXACT integers via the
      // lossless v = score·2³² reconstruction, squared in DECIMAL(38,0).
      val li = tbl(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("pk"),
        (col("l_returnflag") === "R").as("y"),
        graft.plans.TextKernels.unitHashNative(concat(lit("auc_"),
          col("l_orderkey").cast("string"), lit("_"),
          col("l_linenumber").cast("string"))).as("score"))
        .withColumn("one", lit(1L))
      val ranked = operators.ScalableWindow
        .bandedCumSum(li, "score", descending = false, Seq("pk"), "one", "rank")
      val dev = (col("score") * lit(4294967296.0)).cast("long") -
        when(col("y"), lit(4294967296L)).otherwise(lit(0L))
      val devd = dev.cast("decimal(38,0)")
      val a = ranked.agg(
        sum(when(col("y"), col("rank")).otherwise(lit(0L)).cast("decimal(38,0)"))
          .as("rpos"),
        sum(when(col("y"), 1L).otherwise(0L)).as("npos"),
        sum(when(col("y"), 0L).otherwise(1L)).as("nneg"),
        sum(devd * devd).as("ss"),
        count(lit(1)).as("n"))
      def d(c: String): Column = col(c).cast("double")
      a.select(col("npos"), col("nneg"),
        round((d("rpos") - d("npos") * (d("npos") + lit(1.0)) / lit(2.0))
          / (d("npos") * d("nneg")), 6).as("auc"),
        round(d("ss") / (lit(4294967296.0) * lit(4294967296.0)) / d("n"), 6)
          .as("brier"))
    }),

    "q260_nelson_aalen" -> ((s, dir) => {
      // Nelson–Aalen cumulative hazard on the q236 survival table: the
      // same day-grid at-risk machinery, but H(t) = Σ_{event days ≤ t}
      // d/n — an ordered 8-dp fixed-point fold over the event-day grid
      // (calendar-bounded), replayed exactly by the oracle's list_reduce.
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val t0 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
      val firstP = ev.filter(col("event_type") === "purchase")
        .join(t0, Seq("user_id")).filter(col("us") > col("t0"))
        .groupBy(col("user_id")).agg(min(col("us")).as("tp"))
      val lastAny = ev.join(t0, Seq("user_id"))
        .groupBy(col("user_id")).agg(max(col("us")).as("tl"))
      val times = t0.join(firstP, Seq("user_id"), "left")
        .join(lastAny, Seq("user_id"))
        .select(col("user_id"),
          when(col("tp").isNotNull, expr("div(tp - t0, 86400000000)"))
            .otherwise(expr("div(tl - t0, 86400000000)")).as("day"),
          col("tp").isNotNull.as("is_event"))
        .localCheckpoint()
      val nTot = times.agg(count(lit(1)).as("ntot"))
      val grid = times.groupBy(col("day")).agg(
        sum(when(col("is_event"), 1L).otherwise(0L)).as("d"),
        sum(when(col("is_event"), 0L).otherwise(1L)).as("c"))
      val cum = operators.ScalableWindow.boundedRankCum(grid,
        Seq(("day", true)), "t", Seq(("d", "cumd"), ("c", "cumc")))
        .crossJoin(broadcast(nTot))
        .withColumn("n_risk",
          col("ntot") - (col("cumd") - col("d")) - (col("cumc") - col("c")))
        .withColumn("h",
          col("d").cast("double") / col("n_risk").cast("double"))
        .localCheckpoint()
      val eventDays = cum.filter(col("d") > 0)
        .select(col("t"), col("day"), col("n_risk"), col("d"), col("h"))
      eventDays.as("b").join(eventDays.as("a"), col("a.t") <= col("b.t"))
        .groupBy(col("b.day").as("day"), col("b.n_risk").as("n_risk"),
          col("b.d").as("d_events"))
        .agg(aggregate(array_sort(collect_list(struct(col("a.t"),
            col("a.h").as("h")))), lit(0.0),
            (acc, e) => round(acc + e.getField("h"), 8)).as("cumhaz"))
    }),

    "q261_market_concentration" -> ((s, dir) => {
      // Market-concentration audit per nation over supplier revenue:
      // HHI = Σ share² computed as Σrev²/(Σrev)² — EXACT cents and
      // cents² (DECIMAL(38,0)), one final division, no float sums — and
      // CR4 = top-4 suppliers' revenue share via the native TopKPerKey
      // (two-phase per-partition heads, no window).
      val rev = tbl(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"))
          .as("cents"))
      val sup = tbl(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val nat = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val g = rev.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("s_suppkey"), col("cents"))
        .localCheckpoint()
      val cd = col("cents").cast("decimal(38,0)")
      val tot = g.groupBy(col("nation")).agg(count(lit(1)).as("n_suppliers"),
        sum(col("cents")).as("tc"), sum(cd * cd).as("sq"))
      val top4 = org.apache.spark.sql.graft.TopKPerKey(
        g, Seq("nation"), Seq(("cents", false), ("s_suppkey", true)), 4)
        .groupBy(col("nation")).agg(sum(col("cents")).as("c4"))
      def d(c: String): Column = col(c).cast("double")
      tot.join(top4, Seq("nation"))
        .select(col("nation"), col("n_suppliers"),
          round(d("sq") / (d("tc") * d("tc")), 6).as("hhi"),
          round(d("c4") / d("tc"), 6).as("cr4"))
    }),

    "q262_info_gain" -> ((s, dir) => {
      // Information gain of three categorical features predicting the
      // return flag — the feature-ranking primitive of decision-tree
      // curation. Per feature: (category)-bounded exact counts; the
      // label is binary so H(Y|X=x) is the closed-form binary entropy
      // (no inner fold); H(Y|X) = Σ_x (n_x/n)·h(p_x) folds ordered by
      // category with a 10-dp fixed point (oracle: list_reduce).
      def h(p: Column): Column =
        -(when(p > 0, p * log2(p)).otherwise(lit(0.0))) -
          when(p < 1, (lit(1.0) - p) * log2(lit(1.0) - p)).otherwise(lit(0.0))
      def branch(df: DataFrame, feature: String, x: Column): DataFrame = {
        val g = df.groupBy(x.as("x")).agg(count(lit(1)).as("nx"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("px"))
        val tot = g.agg(sum(col("nx")).as("n"), sum(col("px")).as("p"))
        val terms = g.crossJoin(broadcast(tot))
          .select(col("x"),
            ((col("nx").cast("double") / col("n").cast("double")) *
              h(col("px").cast("double") / col("nx").cast("double"))).as("term"),
            (col("p").cast("double") / col("n").cast("double")).as("py"))
        terms.agg(
          aggregate(array_sort(collect_list(struct(col("x"), col("term")))),
            lit(0.0), (acc, e) => round(acc + e.getField("term"), 10)).as("hc"),
          max(col("py")).as("py"))
          .select(lit(feature).as("feature"), round(h(col("py")), 6).as("h_y"),
            round(col("hc"), 6).as("h_y_given_x"),
            round(h(col("py")) - col("hc"), 6).as("info_gain"))
      }
      val li = tbl(s, dir, "lineitem")
      val withOrders = li.join(
        tbl(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      val withPart = li.join(
        broadcast(tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      branch(li, "linestatus", col("l_linestatus"))
        .union(branch(withOrders, "priority", col("o_orderpriority")))
        .union(branch(withPart, "brand", col("p_brand")))
    }),

    "q264_seq_brand_pairs" -> ((s, dir) => {
      // Sequential pattern mining at length 2: brand A in one order,
      // brand B in the same customer's NEXT order (consecutive by order
      // date, orderkey tie-break), support = distinct customers, kept at
      // ≥ 3. The ordering window is customer-partitioned (key-parallel);
      // the brand sets are per-order DISTINCT (bounds the pair explosion
      // to basket², baskets ≤ 7 here); the stream collapses onto the
      // 25×25 brand grid before the distinct-support count.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val seq = tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("next_ok", lead(col("o_orderkey"), 1).over(w))
        .filter(col("next_ok").isNotNull)
        .drop("o_orderdate")
      val ob = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .dropDuplicates("ok", "brand")
        // Checkpointed (r13): consumed by BOTH sequence sides (brand_a
        // and brand_b joins) — one lineitem⋈part dedup build, not two.
        .localCheckpoint()
      seq
        .join(ob.select(col("ok").as("o_orderkey"), col("brand").as("brand_a")),
          Seq("o_orderkey"))
        .join(ob.select(col("ok").as("next_ok"), col("brand").as("brand_b")),
          Seq("next_ok"))
        .groupBy(col("brand_a"), col("brand_b"))
        .agg(countDistinct(col("o_custkey")).as("support"))
        .filter(col("support") >= 3)
    }),

    "q267_order_backlog" -> ((s, dir) => {
      // Open-order backlog (Little's-law WIP curve): arrivals = orders
      // placed per day, completions = orders whose LAST line ships that
      // day, open = cum(arrivals) − cum(completions). Corpus-sized work
      // is two keyed aggregates; the cumulative pass lives on the
      // calendar-bounded day grid via the triangular-join rank (no
      // global window).
      val arr = tbl(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("arrivals"))
      val dep = tbl(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate").cast("date")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("completions"))
      val grid = arr.join(dep, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("arrivals"), lit(0L)).as("arrivals"),
          coalesce(col("completions"), lit(0L)).as("completions"))
      operators.ScalableWindow.boundedRankCum(grid, Seq(("day", true)), "t",
          Seq(("arrivals", "ca"), ("completions", "cc")))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("arrivals"), col("completions"),
          (col("ca") - col("cc")).as("open_orders"))
    }),

    "q268_empirical_bayes" -> ((s, dir) => {
      // Empirical-Bayes (m-estimate, m = 50) shrinkage of per-brand
      // return rates toward the global rate — the stabilized companion
      // of q258's Wilson bound. Exact integer counts; the prior and the
      // shrunk rate are single double divisions mirrored textually.
      val j = tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("pos"))
        .localCheckpoint()
      val g = j.agg(sum(col("n")).as("gn"), sum(col("pos")).as("gp"))
      def d(c: String): Column = col(c).cast("double")
      j.crossJoin(broadcast(g))
        .withColumn("p0", d("gp") / d("gn"))
        .select(col("brand"), col("n"),
          round(d("pos") / d("n"), 6).as("raw_rate"),
          round((d("pos") + lit(50.0) * col("p0")) / (d("n") + lit(50.0)), 6)
            .as("shrunk_rate"))
    }),

    "q272_bh_fdr" -> ((s, dir) => {
      // Benjamini–Hochberg FDR control (q = 0.10) across the 25
      // per-brand return-rate z-tests — the multiple-testing layer the
      // single-test tier (q222/q227) lacks. Φ comes from the
      // Abramowitz–Stegun 7.1.26 erf polynomial (elementary ops only,
      // mirrored textually, so both engines compute the same doubles up
      // to exp()'s ulp — p-values compare 10-dp-ROUNDED). The p-value
      // rank rides the brand-grid triangular join; BH rejects rank ≤
      // max{i : p_(i) ≤ q·i/m}.
      val b = tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("pos"))
        .localCheckpoint()
      val g = b.agg(sum(col("n")).as("gn"), sum(col("pos")).as("gp"))
      def d(c: String): Column = col(c).cast("double")
      val withZ = b.crossJoin(broadcast(g))
        .withColumn("p0", d("gp") / d("gn"))
        .withColumn("z", (d("pos") / d("n") - col("p0"))
          / sqrt(col("p0") * (lit(1.0) - col("p0")) / d("n")))
      // erf(x) ≈ 1 − (a1·t + a2·t² + a3·t³ + a4·t⁴ + a5·t⁵)·e^(−x²),
      // t = 1/(1 + 0.3275911·x), x ≥ 0; p = 2·(1 − Φ(|z|)).
      val x = abs(col("z")) / sqrt(lit(2.0))
      val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
      val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t
        + lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
      val erfX = lit(1.0) - poly * exp(-(x * x))
      val phi = lit(0.5) * (lit(1.0) + erfX)
      val withP = withZ
        .withColumn("p", round(lit(2.0) * (lit(1.0) - phi), 10))
        .select(col("brand"), col("n"), col("z"), col("p"))
      val ranked = operators.ScalableWindow
        .boundedRankCum(withP, Seq(("p", true), ("brand", true)), "bh_rank")
        .localCheckpoint()
      val mm = ranked.agg(count(lit(1)).as("m"))
      val kmax = ranked.crossJoin(broadcast(mm))
        .agg(coalesce(max(when(col("p") <= lit(0.10)
            * col("bh_rank").cast("double") / col("m").cast("double"),
            col("bh_rank"))), lit(0L)).as("kmax"))
      ranked.crossJoin(broadcast(kmax))
        .select(col("brand"), col("n"), round(col("z"), 4).as("z"),
          round(col("p"), 6).as("p_value"), col("bh_rank"),
          (col("bh_rank") <= col("kmax")).as("rejected"))
    }),

    "q273_markov_absorption" -> ((s, dir) => {
      // Absorbing-chain reachability: probability a user's event chain
      // reaches 'purchase' within 5 steps from each state, via 5
      // unrolled rounds of p_k(s) = [s=purchase] + [s≠purchase]·Σ_t
      // T(s,t)·p_{k−1}(t). Corpus work is ONE consecutive-transition
      // count (user-keyed lead window); the iteration lives entirely on
      // the event-type grid (≤ 6 states), replayed by unrolled oracle
      // CTEs.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val tot = trans.groupBy(col("src")).agg(sum(col("c")).as("tc"))
      val tm = trans.join(tot, Seq("src"))
        .select(col("src"), col("dst"),
          (col("c").cast("double") / col("tc").cast("double")).as("w"))
        .localCheckpoint()
      val states = tm.select(col("src").as("state")).distinct()
        .localCheckpoint()
      var p = states.withColumn("p",
        when(col("state") === "purchase", lit(1.0)).otherwise(lit(0.0)))
      for (_ <- 1 to 5) {
        val nxt = tm.join(p.select(col("state").as("dst"), col("p")), Seq("dst"))
          .groupBy(col("src").as("state"))
          .agg(aggregate(array_sort(collect_list(struct(col("dst"),
              (col("w") * col("p")).as("wp")))), lit(0.0),
              (acc, e) => round(acc + e.getField("wp"), 12)).as("reach"))
        p = states.join(nxt, Seq("state"), "left")
          .select(col("state"),
            when(col("state") === "purchase", lit(1.0))
              .otherwise(coalesce(col("reach"), lit(0.0))).as("p"))
          .localCheckpoint()
      }
      p.select(col("state"), round(col("p"), 8).as("p_reach_5"))
    }),

    "q274_removal_attribution" -> ((s, dir) => {
      // Markov removal-effect attribution (the data-driven alternative
      // to q238's time-decay heuristic): conversion = reaching
      // 'purchase' within 6 steps from the synthetic 'start' state;
      // each channel's effect = 1 − P(conv | channel removed)/P(conv);
      // attribution = normalized effects. Corpus work is ONE transition
      // count (user-keyed windows); the five chain evaluations run
      // DRIVER-SIDE over the collected event-type grid (≤ 7 states ⇒
      // ≤ 49 weights — a bounded, documented collect, the config-table
      // class), mirroring the oracle's unrolled CTEs exactly: per round,
      // 12-dp fold over dst-sorted edges, contributions only from dst
      // states that are themselves sources.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val firsts = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(lit("start").as("src"), col("event_type").as("dst"))
      val consec = ev
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("event_type").as("src"), col("nxt").as("dst"))
      val trans = firsts.union(consec)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
      val rows = trans.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val tot = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
      val tm = rows.map { case (a, b, c) => (a, b, c.toDouble / tot(a)) }
      def r(x: Double, dp: Int) =
        BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
      def reach(removed: Option[String], steps: Int): Double = {
        val edges = tm.filter { case (a, b, _) =>
          removed.forall(s0 => a != s0 && b != s0) }
        val srcs = edges.map(_._1).distinct
        var p = srcs.map(st => st -> (if (st == "purchase") 1.0 else 0.0)).toMap
        for (_ <- 1 to steps) {
          p = srcs.map { st =>
            st -> (if (st == "purchase") 1.0
              else edges.filter(_._1 == st).sortBy(_._2)
                .foldLeft(0.0) { case (acc, (_, dst, wt)) =>
                  r(acc + wt * p.getOrElse(dst, 0.0), 12) })
          }.toMap
        }
        p.getOrElse("start", 0.0)
      }
      val channels = Seq("click", "error", "signup", "view")
      val pBase = r(reach(None, 6), 8)
      val eff = channels.map { ch =>
        val pr = r(reach(Some(ch), 6), 8)
        (ch, pr, r(1.0 - pr / pBase, 6))
      }
      val sumRe = eff.sortBy(_._1)
        .foldLeft(0.0) { case (acc, (_, _, re)) => r(acc + re, 12) }
      import s.implicits._
      eff.map { case (ch, pr, re) =>
        (ch, pBase, pr, re, r(re / sumRe, 6))
      }.toDF("channel", "p_base", "p_removed", "removal_effect", "attribution")
    }),

    "q328_abc_xyz" -> ((s, dir) => {
      // ABC–XYZ inventory classification per brand: ABC from the
      // cumulative 1995 revenue share ranked best-first (brand-bounded
      // triangular rank — no window), XYZ from the coefficient of
      // variation of monthly demand on the COMPLETE 12-month grid
      // (absent cells are literal 0). Both class cuts are double
      // comparisons over exact integer moments; output is the 2D class
      // occupancy with its revenue share.
      val li = tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .filter(year(col("l_shipdate")) === 1995)
        .groupBy(col("p_brand").as("brand"), month(col("l_shipdate")).as("m"))
        .agg(sum(expr(s"cast(cast(l_extendedprice as $dec) * 100 as bigint)"))
          .as("rev"),
          sum(expr(s"cast(cast(l_quantity as $dec) * 100 as bigint)"))
          .as("qty"))
      val brands = tbl(s, dir, "part").select(col("p_brand").as("brand"))
        .distinct()
      val months = s.range(1, 13).select(col("id").cast("int").as("m"))
      val grid = brands.crossJoin(broadcast(months))
        .join(li, Seq("brand", "m"), "left")
        .select(col("brand"), col("m"), coalesce(col("rev"), lit(0L)).as("rev"),
          coalesce(col("qty"), lit(0L)).as("qty"))
        .localCheckpoint()
      def d(c: String): Column = col(c).cast("double")
      val q19 = (c: Column) => c.cast("decimal(19,0)")
      val byBrand = grid.groupBy(col("brand"))
        .agg(sum(col("rev")).as("trev"), sum(col("qty")).as("sq"),
          sum(q19(col("qty")) * q19(col("qty"))).as("sqq"))
      val ranked = operators.ScalableWindow.boundedRankCum(
        byBrand.select(col("brand"), col("trev"), col("sq"), col("sqq")),
        Seq(("trev", false), ("brand", true)), "r", Seq(("trev", "cumrev")))
      val tot = byBrand.agg(sum(col("trev")).as("gt"))
      val classed = ranked.crossJoin(broadcast(tot))
        .withColumn("cshare", d("cumrev") / d("gt"))
        .withColumn("abc", when(col("cshare") <= 0.7, "A")
          .when(col("cshare") <= 0.9, "B").otherwise("C"))
        .withColumn("mean", d("sq") / lit(12.0))
        .withColumn("cv",
          sqrt((d("sqq") - d("sq") * d("sq") / lit(12.0)) / lit(12.0))
            / col("mean"))
        .withColumn("xyz", when(col("cv") <= 0.5, "X")
          .when(col("cv") <= 1.0, "Y").otherwise("Z"))
      classed.groupBy(col("abc"), col("xyz"))
        .agg(count(lit(1)).as("n_brands"), sum(col("trev")).as("crev"))
        .crossJoin(broadcast(tot))
        .select(col("abc"), col("xyz"), col("n_brands"),
          round(d("crev") / d("gt"), 6).as("rev_share"))
    }),

    // ── Finance-series tier (q365–q367, round 9) ────────────────────────
    // All three ride the same calendar-bounded base: daily order revenue
    // in exact cents per (nation, day). The corpus collapses to that
    // grid in ONE map-combinable pass (≤ 25 nations × the calendar at
    // any scale), and every window below is PARTITIONED BY nation over
    // grid rows — never corpus rows, never a single global partition.

    "q365_max_drawdown" -> ((s, dir) => {
      // Maximum drawdown of each nation's cumulative revenue series —
      // the classic running-peak scan, all in exact BIGINT cents: the
      // cumulative sum and its running max are windows over the
      // calendar-bounded daily grid, the drawdown the integer min of
      // (cum − peak). No float appears anywhere.
      val daily = dailyRevenue(s, dir)
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      daily
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("peak", max(col("cum")).over(w))
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n_days"),
          min(col("cum") - col("peak")).as("max_drawdown_cents"))
    }),

    "q366_bollinger" -> ((s, dir) => {
      // Bollinger-band breakout counter per nation: 7-day rolling mean
      // and sample σ over the daily grid (exact integer Σx/Σx² inside
      // the frame → one fixed double sequence), a breakout when the day
      // closes beyond mean ± 2σ. Only full 7-day frames count — the
      // warm-up rows are excluded on both engines.
      val daily = dailyRevenue(s, dir)
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
        .rowsBetween(-6, 0)
      val nW = count(lit(1)).over(w)
      val mean = sum(col("c")).over(w).cast("double") / lit(7.0)
      // The square is cast BEFORE multiplying: daily revenue grows with
      // the corpus, so c² would overflow BIGINT per element at scale.
      val sd = sqrt((sum(col("c").cast("decimal(19,0)") *
          col("c").cast("decimal(19,0)")).over(w)
        .cast("double") - sum(col("c")).over(w).cast("double") *
          sum(col("c")).over(w).cast("double") / lit(7.0)) / lit(6.0))
      daily
        .withColumn("nw", nW)
        .withColumn("up", col("c").cast("double") > mean + lit(2.0) * sd)
        .withColumn("dn", col("c").cast("double") < mean - lit(2.0) * sd)
        .filter(col("nw") === 7)
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("up"), 1L).otherwise(0L)).as("n_breakout_up"),
          sum(when(col("dn"), 1L).otherwise(0L)).as("n_breakout_down"))
    }),

    // ── Control-chart / forecast tier (q441–q443, round 10) ─────────────
    // Same calendar-bounded daily grid as q365–q367; the EWMA recurrence
    // is replayed per day as an ordered prefix fold (first element =
    // init, DuckDB list_reduce's own convention) — O(days²) per nation,
    // CONSTANT at any corpus scale because the grid is the calendar.

    "q465_newsvendor" -> ((s, dir) => {
      // Newsvendor stocking audit per nation: the critical-fractile
      // stock s* = the shared interpolated 75th percentile of daily
      // demand (cents), expected shortage E[(D−s*)⁺] and overage
      // E[(s*−D)⁺] as exact integer tail sums against the shared double
      // threshold (the q367 VaR compare discipline), each divided once
      // by the day count.
      // the tails stay EXACT integers (Σc and counts); the threshold
      // enters once per tail as count·s* — a plain double sum of
      // (c − s*) terms would be summation-order-dependent
      val daily = dailyRevenue(s, dir)
      val st = daily.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_days"),
          expr("percentile(CAST(c AS DOUBLE), 0.75)").as("sstar"))
      def d(c: Column) = c.cast("double")
      daily.join(st, Seq("nation"))
        .groupBy(col("nation"), col("n_days"), col("sstar"))
        .agg(
          sum(when(d(col("c")) > col("sstar"), col("c")).otherwise(0L))
            .as("ss"),
          sum(when(d(col("c")) > col("sstar"), 1L).otherwise(0L)).as("ns"),
          sum(when(d(col("c")) < col("sstar"), col("c")).otherwise(0L))
            .as("so"),
          sum(when(d(col("c")) < col("sstar"), 1L).otherwise(0L)).as("no"))
        .select(col("nation"), col("n_days"),
          round(col("sstar"), 4).as("s_star_cents"),
          round((d(col("ss")) - d(col("ns")) * col("sstar")) /
            d(col("n_days")), 4).as("exp_shortage"),
          round((d(col("no")) * col("sstar") - d(col("so"))) /
            d(col("n_days")), 4).as("exp_overage"))
    }),

    "q457_stl_strength" -> ((s, dir) => {
      // STL-style seasonal/trend strengths per nation on the daily
      // grid: seasonal = weekday mean − nation mean (a closed-form
      // seasonal component, no iterative loess), trend = centered 7-day
      // MA (full frames only), remainder the rest; strengths
      // F = max(0, 1 − Var(R)/Var(X+R)) for X ∈ {S, T} — every variance
      // from day-ordered folds of identical doubles.
      val daily = dailyRevenue(s, dir)
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      val wf = w.rowsBetween(-3, 3)
      val base = daily
        .withColumn("wd", pmod(datediff(col("d"), lit("1970-01-01")), lit(7)))
        .withColumn("x", col("c").cast("double"))
      val mu = base.groupBy(col("nation"))
        .agg((sum(col("c")).cast("double") / count(lit(1)).cast("double"))
          .as("mu"))
      val sw = base.groupBy(col("nation"), col("wd"))
        .agg((sum(col("c")).cast("double") / count(lit(1)).cast("double"))
          .as("wmu"))
      val comp = base
        .withColumn("nw", count(lit(1)).over(wf))
        .withColumn("tr", sum(col("c")).over(wf).cast("double") / lit(7.0))
        .join(broadcast(mu), Seq("nation"))
        .join(broadcast(sw), Seq("nation", "wd"))
        .filter(col("nw") === 7)
        .withColumn("sc", col("wmu") - col("mu"))
        .withColumn("r", col("x") - col("tr") - col("sc"))
        .withColumn("t2", row_number().over(w).cast("long"))
      def fold(wc: Column, nm: String) =
        aggregate(array_sort(collect_list(struct(col("t2"), wc.as(nm)))),
          lit(0.0), (acc, e) => acc + e.getField(nm))
      def varOf(sq: Column, sm: Column, n: Column) =
        (sq - sm * sm / n.cast("double")) / n.cast("double")
      val sums = comp.groupBy(col("nation"))
        .agg(count(lit(1)).as("n"),
          fold(col("r") * col("r"), "a").as("rr"),
          fold(col("r"), "b").as("rs"),
          fold((col("sc") + col("r")) * (col("sc") + col("r")), "c2").as("srr"),
          fold(col("sc") + col("r"), "d2").as("srs"),
          fold((col("tr") + col("r")) * (col("tr") + col("r")), "e2").as("trr"),
          fold(col("tr") + col("r"), "f2").as("trs"))
      val vr = varOf(col("rr"), col("rs"), col("n"))
      val vsr = varOf(col("srr"), col("srs"), col("n"))
      val vtr = varOf(col("trr"), col("trs"), col("n"))
      sums.select(col("nation"), col("n").as("n_days"),
        round(when(vsr > 0, greatest(lit(0.0), lit(1.0) - vr / vsr)), 6)
          .as("f_seasonal"),
        round(when(vtr > 0, greatest(lit(0.0), lit(1.0) - vr / vtr)), 6)
          .as("f_trend"))
    }),

    "q458_hill_tail" -> ((s, dir) => {
      // Hill tail-index estimator on the global top-101 order totals:
      // α̂ = (k−1) / Σ ln(xᵢ/x_k) over the 100 exceedances of the 101st
      // largest — the EVT heaviness gauge behind VaR scaling. TopKPerKey
      // bounds the order stream map-side BEFORE any rank; each ln term
      // rounds to 6 dp (libm contract) and folds in rank order.
      val cents = tbl(s, dir, "orders")
        .select(col("o_orderkey"),
          (col("o_totalprice").cast(dec) * 100).cast("long").as("c"))
      val top = org.apache.spark.sql.graft.TopKPerKey(
        cents.withColumn("g", lit(1)), Seq("g"),
        Seq(("c", false), ("o_orderkey", true)), k = 101).drop("g")
      val ranked = operators.ScalableWindow.boundedRankCum(
        top, Seq(("c", false), ("o_orderkey", true)), "rk")
        .localCheckpoint()
      val xk = ranked.filter(col("rk") === 101)
        .select(col("c").as("ck"))
      val terms = ranked.filter(col("rk") <= 100).crossJoin(broadcast(xk))
        .select(col("rk"),
          round(log(col("c").cast("double") / col("ck").cast("double")), 6)
            .as("t"), col("ck"))
      terms.groupBy(col("ck"))
        .agg(count(lit(1)).as("k_exceedances"),
          aggregate(array_sort(collect_list(struct(col("rk"),
            col("t").as("t")))), lit(0.0), (acc, e) => acc + e.getField("t"))
            .as("sl"))
        .select(col("k_exceedances"), col("ck").as("xk_cents"),
          round(when(col("sl") > 0,
            col("k_exceedances").cast("double") / col("sl")), 6)
            .as("hill_alpha"))
    }),

    // ── Serial-correlation diagnostics tier (q453–q455, round 10) ──────
    // Per-nation tests over the same calendar-bounded daily grid; every
    // residual/sum derives from exact integer moments, folded day-
    // ordered — the no-libm, no-unpartitioned-window contract.

    "q453_durbin_watson" -> ((s, dir) => {
      // Durbin–Watson on the residuals of each nation's linear trend
      // fit: slope/intercept from exact integer moments (t = day index,
      // x = cents; Σtx in decimal(38,0)), residuals e_t as identical
      // doubles, DW = Σ(e_t − e_{t−1})² / Σe_t² with both sums folded
      // in day order.
      val daily = dailyRevenue(s, dir)
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      val t = daily.withColumn("t", row_number().over(w).cast("long"))
        .select(col("nation"), col("d"), col("t"), col("c"))
        .localCheckpoint()
      val s38 = "decimal(38,0)"
      val mom = t.groupBy(col("nation"))
        .agg(count(lit(1)).as("n"), sum(col("t").cast(s38)).as("st"),
          sum((col("t") * col("t")).cast(s38)).as("stt"),
          sum(col("c").cast(s38)).as("sx"),
          sum((col("t").cast(s38) * col("c").cast(s38))).as("stx"))
      def d(c: Column) = c.cast("double")
      val slope = (d(col("n")) * d(col("stx")) - d(col("st")) * d(col("sx"))) /
        (d(col("n")) * d(col("stt")) - d(col("st")) * d(col("st")))
      val icept = (d(col("sx")) - slope * d(col("st"))) / d(col("n"))
      val fit = t.join(mom.select(col("nation"), slope.as("b"), icept.as("a")),
          Seq("nation"))
        .withColumn("e", d(col("c")) - (col("a") + col("b") * d(col("t"))))
        .withColumn("eprev", lag(col("e"), 1).over(w))
      def fold(wc: Column, nm: String) =
        aggregate(array_sort(collect_list(struct(col("t"), wc.as(nm)))),
          lit(0.0), (acc, e) => acc + e.getField(nm))
      fit.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_days"),
          fold(col("e") * col("e"), "s").as("see"),
          fold(when(col("eprev").isNotNull,
            (col("e") - col("eprev")) * (col("e") - col("eprev")))
            .otherwise(lit(0.0)), "q").as("sdd"))
        .select(col("nation"), col("n_days"),
          round(when(col("see") > 0, col("sdd") / col("see")), 6).as("dw"))
    }),

    "q454_runs_test" -> ((s, dir) => {
      // Wald–Wolfowitz runs test on the SIGN of daily revenue deltas
      // (zero deltas dropped, the standard treatment): run count R and
      // the n₊/n₋ tallies are exact integers; z = (R − μ)/σ with the
      // closed-form moments — one sqrt, degenerate σ² ≤ 0 or an
      // empty-sign arm ⇒ NULL by mirrored guard.
      val daily = dailyRevenue(s, dir)
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      val sgn = daily.withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull && col("c") =!= col("prev"))
        .withColumn("sg", when(col("c") > col("prev"), 1L).otherwise(-1L))
      val w2 = Window.partitionBy(col("nation")).orderBy(col("d"))
      val runs = sgn.withColumn("sprev", lag(col("sg"), 1).over(w2))
        .groupBy(col("nation"))
        .agg(sum(when(col("sg") === 1L, 1L).otherwise(0L)).as("np"),
          sum(when(col("sg") === -1L, 1L).otherwise(0L)).as("nm"),
          (sum(when(col("sprev").isNull ||
            col("sprev") =!= col("sg"), 1L).otherwise(0L))).as("r"))
      def d(c: Column) = c.cast("double")
      val nn = d(col("np")) + d(col("nm"))
      val mu = lit(2.0) * d(col("np")) * d(col("nm")) / nn + lit(1.0)
      val v = lit(2.0) * d(col("np")) * d(col("nm")) *
        (lit(2.0) * d(col("np")) * d(col("nm")) - nn) /
        (nn * nn * (nn - lit(1.0)))
      runs.select(col("nation"), col("np"), col("nm"), col("r").as("n_runs"),
        round(when(col("np") > 0 && col("nm") > 0 && v > 0,
          (d(col("r")) - mu) / sqrt(v)), 6).as("z"))
    }),

    "q455_ljung_box" -> ((s, dir) => {
      // Ljung–Box Q at lags 1..7 on each nation's demeaned daily cents:
      // r_k = Σ e_t·e_{t−k} / Σ e_t² with every sum folded day-ordered
      // (e_t doubles from the exact mean Σx/n), Q = n(n+2)·Σ r_k²/(n−k).
      // Nations with n ≤ 8 are NULL by mirrored guard.
      val daily = dailyRevenue(s, dir)
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      val mean = daily.groupBy(col("nation"))
        .agg((sum(col("c")).cast("double") /
          count(lit(1)).cast("double")).as("mu"), count(lit(1)).as("n"))
      val e = daily.join(mean, Seq("nation"))
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("e", col("c").cast("double") - col("mu"))
      val lagged = (1 to 7).foldLeft(e) { case (acc, k) =>
        acc.withColumn(s"e$k", lag(col("e"), k).over(w))
      }
      def fold(wc: Column, nm: String) =
        aggregate(array_sort(collect_list(struct(col("t"), wc.as(nm)))),
          lit(0.0), (acc, x) => acc + x.getField(nm))
      val aggCols = Seq(max(col("n")).as("n"),
        fold(col("e") * col("e"), "s0").as("s0")) ++
        (1 to 7).map(k => fold(when(col(s"e$k").isNotNull,
          col("e") * col(s"e$k")).otherwise(lit(0.0)), s"c$k")
          .as(s"s$k"))
      val sums = lagged.groupBy(col("nation"))
        .agg(aggCols.head, aggCols.tail: _*)
      def d(c: Column) = c.cast("double")
      val q = (1 to 7).map { k =>
        val rk = col(s"s$k") / col("s0")
        rk * rk / (d(col("n")) - lit(k.toDouble))
      }.reduce(_ + _) * d(col("n")) * (d(col("n")) + lit(2.0))
      sums.select(col("nation"), col("n").as("n_days"),
        round(when(col("s0") > 0, col("s1") / col("s0")), 6).as("r1"),
        round(when(col("n") > 8 && col("s0") > 0, q), 6).as("lb_q"))
    }),

    "q441_cusum_chart" -> ((s, dir) => {
      // Tabular CUSUM on daily revenue, ALL in exact BIGINT cents via
      // the drawdown identity (KernelProps' clamp-at-zero pin):
      // s⁺_t = max(0, s⁺ + (c − T − k)) == cum_t − min(0, runmin cum),
      // so both one-sided sums are partitioned windows over the grid —
      // no recursion, no float. Target T = mean cents (integer div),
      // slack k = T/100, decision limit h = 10k.
      val daily = dailyRevenue(s, dir)
      val t0 = daily.groupBy(col("nation"))
        .agg(expr("sum(c) div count(*)").as("tt"))
        .withColumn("k", expr("tt div 100"))
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      val cs = daily.join(broadcast(t0), Seq("nation"))
        .withColumn("cup", sum(col("c") - col("tt") - col("k")).over(w))
        .withColumn("cdn", sum(col("tt") - col("c") - col("k")).over(w))
        .withColumn("sup", col("cup") -
          least(lit(0L), min(col("cup")).over(w)))
        .withColumn("sdn", col("cdn") -
          least(lit(0L), min(col("cdn")).over(w)))
      cs.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("sup") > col("k") * 10, 1L).otherwise(0L))
            .as("n_alarm_up"),
          sum(when(col("sdn") > col("k") * 10, 1L).otherwise(0L))
            .as("n_alarm_down"),
          max(col("sup")).as("max_cusum_up"),
          max(col("sdn")).as("max_cusum_down"))
    }),

    "q442_ewma_chart" -> ((s, dir) => {
      // EWMA control chart (α = 1/4): s_t = 0.25·x_t + 0.75·s_{t−1},
      // s_1 = x_1, replayed per day as a fold over the ordered prefix —
      // the fold's FIRST element is the init (list_reduce's convention,
      // mirrored with slice + element_at on the Spark side), every op
      // an identical IEEE double in both engines. A day alarms when it
      // deviates from yesterday's smoothed level by more than 50%.
      val byNation = ewmaPrefix(dailyRevenue(s, dir))
      byNation
        .withColumn("alarm", col("sprev").isNotNull &&
          abs(col("x") - col("sprev")) > lit(0.5) * col("sprev"))
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
          round(max(when(col("rn") === col("nd"), col("snow"))), 4)
            .as("ewma_final"))
    }),

    "q443_theil_u2" -> ((s, dir) => {
      // Theil's U₂ for the EWMA one-step forecast vs the naive carry-
      // forward: U₂ = √(Σ(s_{t−1} − x_t)² / Σ(x_{t−1} − x_t)²) over the
      // evaluable days (t ≥ 2). U₂ < 1 ⇔ the smoother beats naive.
      // Terms are squares of identical doubles, folded in day order; a
      // zero naive denominator (constant series) yields NULL by
      // mirrored guard.
      val byNation = ewmaPrefix(dailyRevenue(s, dir))
      val ev = byNation.filter(col("sprev").isNotNull)
      def fold(w: Column, nm: String) =
        aggregate(array_sort(collect_list(struct(col("d"), w.as(nm)))),
          lit(0.0), (acc, e) => acc + e.getField(nm))
      ev.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_eval_days"),
          fold((col("sprev") - col("x")) * (col("sprev") - col("x")), "f")
            .as("sf"),
          fold((col("xprev") - col("x")) * (col("xprev") - col("x")), "n")
            .as("sn"))
        .select(col("nation"), col("n_eval_days"),
          round(when(col("sn") > 0, sqrt(col("sf") / col("sn"))), 6)
            .as("theil_u2"))
    }),

    "q367_hist_var" -> ((s, dir) => {
      // Historical VaR/CVaR of daily revenue CHANGES per nation: deltas
      // are exact integer cents (lag over the grid), VaR the 5%
      // interpolated quantile both engines share, CVaR one double
      // division of the exact tail sum. The tail membership compare
      // (delta ≤ VaR) sees an exact integer against a double both
      // engines computed identically.
      val daily = dailyRevenue(s, dir)
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      val deltas = daily
        .withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("nation"), (col("c") - col("prev")).as("delta"))
      val v = deltas.groupBy(col("nation"))
        .agg(expr("percentile(CAST(delta AS DOUBLE), 0.05)").as("var5"),
          count(lit(1)).as("n_days"))
      deltas.join(v, Seq("nation"))
        .filter(col("delta").cast("double") <= col("var5"))
        .groupBy(col("nation"), col("n_days"), col("var5"))
        .agg(count(lit(1)).as("n_tail"),
          sum(col("delta")).as("tail_sum"))
        .select(col("nation"), col("n_days"), round(col("var5"), 4).as("var_5pct"),
          col("n_tail"),
          round(col("tail_sum").cast("double") / col("n_tail").cast("double"), 4)
            .as("cvar_5pct"))
    }),
  )

  /** q373/q374 live here (the relational-mechanics corner of the
    * warehouse tier): interval coalescing and sequential pattern
    * trigrams, both per-key windows over key-partitioned event rows —
    * the q42-sessionize class, never a global window.
    */
  private val roundNine: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q373_interval_coalesce" -> ((s, dir) => {
      // Gaps-and-islands interval coalescing per supplier: each lineitem
      // occupies [shipdate, shipdate + quantity days]; overlapping or
      // touching intervals merge into islands (a new island starts when
      // the ship date passes the running max of previous interval ends —
      // the classic scan, deterministic under ties because an
      // equal-start row can never out-run its predecessor's end). All
      // date arithmetic is exact integer days.
      val iv = tbl(s, dir, "lineitem")
        .select(col("l_suppkey").as("supp"),
          to_date(col("l_shipdate")).as("st"),
          date_add(to_date(col("l_shipdate")),
            col("l_quantity").cast("int")).as("en"))
      val w = Window.partitionBy(col("supp")).orderBy(col("st"), col("en"))
      val prevMax = max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1))
      val isl = iv
        .withColumn("new_isl",
          when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L))
        .withColumn("island",
          sum(col("new_isl")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      isl.groupBy(col("supp"), col("island"))
        .agg(count(lit(1)).as("n_iv"),
          (datediff(max(col("en")), min(col("st"))) + 1).as("days"))
        .groupBy(col("supp"))
        .agg(sum(col("n_iv")).as("n_intervals"),
          count(lit(1)).as("n_islands"),
          sum(col("days")).cast("long").as("covered_days"))
    }),

    "q390_shapley_attribution" -> ((s, dir) => {
      // Exact Shapley-value attribution over the four non-purchase
      // channels — the axiomatic completion of the attribution family
      // (last-touch q206, time-decay q238, leave-one-out q274):
      // v(S) = share of users converted having touched ONLY channels in
      // S; φ_i sums w(|S|)·(v(S∪i) − v(S)) over the 8 S ∌ i with the
      // closed-form weights. Everything lives on the 16-row mask GRID
      // (bitmask subset-sum join, 16×16), the weights are ONE Scala
      // constant list consumed by both engines (the rboWeights
      // discipline), and the 8 per-channel terms fold in S order.
      // Only PRE-conversion touches count (events before the user's
      // first purchase; non-converters contribute all their events) —
      // the attribution-correct window, and the thing that makes the
      // mask grid non-degenerate (every heavy user eventually touches
      // everything; what matters is what they touched BEFORE buying).
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val firstP = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      val pre = ev.join(firstP, Seq("user_id"), "left")
        .filter(col("event_type") =!= "purchase" &&
          (col("t0").isNull || col("ts") < col("t0")))
        .select(col("user_id"), col("event_type"))
      def touched(t: String) = max(when(col("event_type") === t, 1L).otherwise(0L))
      val users = ev.select(col("user_id")).distinct()
        .join(pre, Seq("user_id"), "left")
        .join(firstP.select(col("user_id"), lit(1L).as("cv")),
          Seq("user_id"), "left")
        .groupBy(col("user_id"))
        .agg(coalesce(touched("click") + touched("error") * 2 +
          touched("signup") * 4 + touched("view") * 8, lit(0L))
          .cast("int").as("mask"),
          coalesce(max(col("cv")), lit(0L)).as("conv"))
        .localCheckpoint()
      val nUsers = users.agg(count(lit(1)).as("nu"))
      val grid = users.groupBy(col("mask")).agg(sum(col("conv")).as("nc"))
        .localCheckpoint()
      val subsets = s.range(0, 16).select(col("id").cast("int").as("sset"))
      // LEFT join: a subset covering NO observed mask (e.g. ∅ when every
      // user touched something) still needs its cum = 0 row — the c1
      // side of every Shapley term.
      val cum = subsets.join(broadcast(grid),
          col("mask").bitwiseAND(col("sset")) === col("mask"), "left")
        .groupBy(col("sset")).agg(coalesce(sum(col("nc")), lit(0L)).as("cum"))
        .localCheckpoint()
      import s.implicits._
      val chan = Seq(("click", 1), ("error", 2), ("signup", 4), ("view", 8))
        .toDF("channel", "bit")
      val w = QueryDsl.shapleyWeights // w(|S|) for |S| = 0..3
      val wS = (0 to 3).foldLeft(lit(0.0)) { (acc, k) =>
        when(bit_count(col("sset")) === k, lit(w(k))).otherwise(acc)
      }
      chan.join(cum.select(col("sset"), col("cum")),
          col("sset").bitwiseAND(col("bit")) === 0)
        .join(cum.select(col("sset").as("s2"), col("cum").as("cum2")),
          col("s2") === col("sset") + col("bit"))
        .crossJoin(broadcast(nUsers))
        .select(col("channel"), col("sset"),
          round(wS * (col("cum2") - col("cum")).cast("double") /
            col("nu").cast("double"), 9).as("term"))
        .groupBy(col("channel"))
        // unrounded (roundlint r11): 9-dp term fold on a 6-dp output
        // grid — boundary class; the fold is bit-identical both engines
        .agg(aggregate(
          array_sort(collect_list(struct(col("sset"), col("term")))),
          lit(0.0), (a, e) => a + e.getField("term")).as("shapley"))
    }),

    "q392_record_counts" -> ((s, dir) => {
      // Record-values test per nation: how often the daily revenue set
      // a new all-time high. Under exchangeable (trend-free) days the
      // expected record count is the harmonic number H_n — the classic
      // distribution-free trend diagnostic; ratio >> 1 means the series
      // drifts upward. Records via a per-nation window over the
      // calendar grid; H_n as a 6-dp ordered fold over the same grid.
      val daily = dailyRevenue(s, dir)
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      val prevMax = max(col("c")).over(w.rowsBetween(Window.unboundedPreceding, -1))
      val recs = daily
        .withColumn("rec", when(prevMax.isNull || col("c") > prevMax, 1L)
          .otherwise(0L))
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n_days"), sum(col("rec")).as("n_records"))
      val harm = daily
        .select(col("nation"), row_number().over(w).as("k"))
        .select(col("nation"), col("k"),
          round(lit(1.0) / col("k").cast("double"), 9).as("h"))
        .groupBy(col("nation"))
        .agg(aggregate(array_sort(collect_list(struct(col("k"), col("h")))),
          lit(0.0), (a, e) => a + e.getField("h")).as("hsum"))
      recs.join(harm, Seq("nation"))
        // expected_records unrounded (roundlint r11): 9-dp harmonic
        // fold on a 4-dp grid — boundary class; record_ratio keeps its
        // round (integer/sum ratio, off any grid)
        .select(col("nation"), col("n_days"), col("n_records"),
          col("hsum").as("expected_records"),
          round(col("n_records").cast("double") / col("hsum"), 4)
            .as("record_ratio"))
    }),

    "q384_rbo_rankings" -> ((s, dir) => {
      // Rank-biased overlap (Webber et al. 2010, p = 0.9, truncated at
      // depth 20) between the top-20 customers by FIRST-half spend and
      // by SECOND-half spend — the top-weighted way to compare two
      // rankings of the same population (the same customer base ranked
      // twice correlates by construction, so the metric is exercised,
      // unlike disjoint ad-hoc rankings). Both top-20s are
      // TakeOrderedAndProject; positions come from the triangular
      // self-join (the q174 rule: no window, not even over 20 rows);
      // the depth terms use PRECOMPUTED (1−p)/p·p^d literals
      // (QueryDsl.rboWeights — ONE Scala constant list consumed by
      // both engines; pow() is libm territory, the fencePoly
      // discipline) folded in depth order on the 9-dp grid.
      val cents = (col("o_totalprice").cast(dec) * 100).cast("long")
      val per = tbl(s, dir, "orders")
        .select(col("o_custkey").as("ck"),
          (col("o_orderdate") < lit("1995-01-01")).as("h1"), cents.as("c"))
        .groupBy(col("ck"))
        .agg(sum(when(col("h1"), col("c")).otherwise(0L)).as("xa"),
          sum(when(!col("h1"), col("c")).otherwise(0L)).as("xb"))
        .localCheckpoint()
      def ranked(xc: String, name: String) = {
        val top = per.select(col("ck"), col(xc).as("s"))
          .orderBy(col("s").desc, col("ck")).limit(20)
          .localCheckpoint()
        val o = top.select(col("ck").as("o_id"), col("s").as("o_s"))
        top.join(o, col("o_s") > col("s") ||
            (col("o_s") === col("s") && col("o_id") < col("ck")), "left")
          .groupBy(col("ck"))
          .agg((count(col("o_id")) + 1).as(name))
      }
      val bt = ranked("xa", "pa").join(ranked("xb", "pb"), Seq("ck"))
      val depths = s.range(1, 21).select(col("id").as("d"))
      val wd = QueryDsl.rboWeights.zipWithIndex.foldLeft(lit(0.0)) {
        case (acc, (p, i)) => when(col("d") === (i + 1), lit(p)).otherwise(acc)
      }
      bt.crossJoin(depths)
        .filter(col("pa") <= col("d") && col("pb") <= col("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("x_d"))
        .select(col("d"),
          round(wd * col("x_d").cast("double") / col("d").cast("double"), 9)
            .as("term"),
          col("x_d"))
        .agg(
          round(coalesce(
            aggregate(array_sort(collect_list(struct(col("d"), col("term")))),
              lit(0.0), (a, e) => a + e.getField("term")), lit(0.0)), 6)
            .as("rbo_min"),
          coalesce(max(when(col("d") === 20, col("x_d"))), lit(0L))
            .as("overlap_at_20"))
        .select(lit(20L).as("depth"), col("rbo_min"), col("overlap_at_20"))
    }),

    "q376_gap_sequence_pairs" -> ((s, dir) => {
      // Sequential pattern mining, gap-constrained form (the GSP
      // complement of q374's consecutive trigrams): brand A followed by
      // a DIFFERENT brand B within 30 days, per customer. The self-join
      // is equi on the customer plus a date band, so per-customer
      // fanout is events × events-per-30-days — purchase-rate-bounded,
      // not corpus-bounded (the q57 as-of class). Pure integer counts.
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val ev = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("o_custkey").as("ck"), col("d"), col("p_brand").as("b"))
        .localCheckpoint()
      val e1 = ev.select(col("ck"), col("d").as("d1"), col("b").as("b_from"))
      val e2 = ev.select(col("ck"), col("d").as("d2"), col("b").as("b_to"))
      e1.join(e2, Seq("ck"))
        .filter(col("d2") > col("d1") &&
          datediff(col("d2"), col("d1")) <= 30 &&
          col("b_from") =!= col("b_to"))
        .groupBy(col("b_from"), col("b_to"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("ck")).as("n_customers"))
        .filter(col("n_pairs") >= 5)
    }),

    "q380_churn_hazard" -> ((s, dir) => {
      // Discrete-time churn hazard by tenure month: a customer churns
      // if silent for the last 3 observed months; hazard(τ) = churn
      // events at tenure τ / customers still at risk (tenure ≥ τ). The
      // corpus collapses to per-customer (first, last) month pairs,
      // then the TENURE GRID (≤ the calendar in months); the at-risk
      // reverse-cumulative is the grid's triangular join (the q236
      // Kaplan–Meier shape), never a global window.
      val m = year(col("o_orderdate")) * 12 + month(col("o_orderdate"))
      val per = tbl(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(m).as("m0"), max(m).as("ml"))
        .localCheckpoint()
      val mmax = per.agg(max(col("ml")).as("mm"))
      val grid = per.crossJoin(broadcast(mmax))
        .select((col("ml") - col("m0")).as("t"),
          when(col("ml") <= col("mm") - 3, 1L).otherwise(0L).as("churn"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("c_t"), sum(col("churn")).as("d_t"))
        .localCheckpoint()
      val g2 = grid.select(col("t").as("t2"), col("c_t").as("c2"))
      grid.join(g2, col("t2") >= col("t"))
        .groupBy(col("t"), col("d_t"))
        .agg(sum(col("c2")).as("n_at_risk"))
        .select(col("t").as("tenure_months"), col("n_at_risk"),
          col("d_t").as("n_events"),
          round(col("d_t").cast("double") / col("n_at_risk").cast("double"), 6)
            .as("hazard"))
    }),

    "q381_segment_migration" -> ((s, dir) => {
      // Value-segment migration matrix between the two halves of the
      // calendar (split at 1995-01-01): per-customer exact spend cents
      // per half, quintile boundaries from the interpolated percentile
      // grid of the ACTIVE customers of each half (broadcast back — the
      // q142 threshold pattern, no global ntile window), inactive
      // halves labeled segment 0. Output is the ≤ 6×6 matrix.
      val cents = (col("o_totalprice").cast(dec) * 100).cast("long")
      val per = tbl(s, dir, "orders")
        .select(col("o_custkey").as("ck"),
          (col("o_orderdate") < lit("1995-01-01")).as("h1"), cents.as("c"))
        .groupBy(col("ck"))
        .agg(sum(when(col("h1"), col("c")).otherwise(0L)).as("xa"),
          sum(when(!col("h1"), col("c")).otherwise(0L)).as("xb"))
        .localCheckpoint()
      def bounds(xc: String) = per.filter(col(xc) > 0)
        .agg(expr(s"percentile(CAST($xc AS DOUBLE), array(0.2,0.4,0.6,0.8))").as(s"q_$xc"))
      def seg(xc: String, q: String) = when(col(xc) === 0, 0)
        .when(col(xc).cast("double") <= element_at(col(q), 1), 1)
        .when(col(xc).cast("double") <= element_at(col(q), 2), 2)
        .when(col(xc).cast("double") <= element_at(col(q), 3), 3)
        .when(col(xc).cast("double") <= element_at(col(q), 4), 4)
        .otherwise(5)
      per.crossJoin(broadcast(bounds("xa"))).crossJoin(broadcast(bounds("xb")))
        .select(seg("xa", "q_xa").as("seg_from"), seg("xb", "q_xb").as("seg_to"))
        .groupBy(col("seg_from"), col("seg_to"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    "q382_stickiness" -> ((s, dir) => {
      // Monthly actives over trailing-3-month actives (the DAU/MAU
      // ratio at order granularity): exact distinct counts via the
      // (customer, month) pair table exploded onto its ≤ 3 target
      // months — calendar-bounded grid join, no approximate sketches.
      val m = (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m")
      val cm = tbl(s, dir, "orders")
        .select(col("o_custkey").as("ck"), m).distinct()
        .localCheckpoint()
      val monthly = cm.groupBy(col("m")).agg(countDistinct(col("ck")).as("active"))
      val trailing = cm
        .select(col("ck"), explode(sequence(col("m"), col("m") + 2)).as("tm"))
        .groupBy(col("tm")).agg(countDistinct(col("ck")).as("active3"))
      monthly.join(trailing, col("m") === col("tm"))
        // Only months with a full 3-month trailing window (the first two
        // observed months see a truncated window on both engines, but
        // excluding them keeps the metric honest).
        .crossJoin(broadcast(cm.agg(min(col("m")).as("mmin"))))
        .filter(col("m") >= col("mmin") + 2)
        .select(col("m").as("month_idx"), col("active"), col("active3"),
          round(col("active").cast("double") / col("active3").cast("double"), 6)
            .as("stickiness"))
    }),

    "q374_brand_trigrams" -> ((s, dir) => {
      // Sequential pattern mining, consecutive length-3 form: each
      // customer's purchase stream (ordered by order date, then the
      // orderkey/linenumber total order — fully deterministic) yields
      // its consecutive brand trigrams; support counts occurrences and
      // distinct customers. lead() windows are per-customer — the
      // events-class partitioning — and the support table is
      // brand³-bounded at any scale.
      val li = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val ev = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("o_custkey").as("ck"), col("o_orderdate").as("d"),
          col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          col("p_brand").as("b1"))
      // The synthetic lineitem carries duplicate (orderkey, linenumber)
      // rows with DIFFERENT parts, so the brand itself joins the total
      // order — remaining ties are same-brand rows, interchangeable for
      // a brand sequence.
      val w = Window.partitionBy(col("ck"))
        .orderBy(col("d"), col("ok"), col("ln"), col("b1"))
      ev.withColumn("b2", lead(col("b1"), 1).over(w))
        .withColumn("b3", lead(col("b1"), 2).over(w))
        .filter(col("b3").isNotNull)
        .groupBy(col("b1"), col("b2"), col("b3"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("ck")).as("n_customers"))
        .filter(col("n_occurrences") >= 3)
    }),

    "q400_order_gaps" -> ((s, dir) => {
      // Interpurchase-interval profile per nation: day gaps between each
      // customer's consecutive orders (customer-partitioned lag window —
      // the q42 sessionize class, never global). Equal order dates make
      // the gap MULTISET order-invariant (consecutive pairs of a sorted
      // sequence depend only on the sorted values), so no tie-break
      // column is needed for cross-engine agreement. Mean is an exact
      // integer sum over count; the median is the shared interpolation.
      val o = tbl(s, dir, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      val c = tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      o.withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(w)))
        .filter(col("gap").isNotNull)
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("gap").cast("long").as("gap"))
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sgap"),
          expr("percentile(CAST(gap AS DOUBLE), 0.5)").as("med"),
          max(col("gap")).as("max_gap"))
        .select(col("nation"), col("n_gaps"),
          round(col("sgap").cast("double") / col("n_gaps").cast("double"), 4)
            .as("mean_gap"),
          round(col("med"), 2).as("median_gap"), col("max_gap"))
    }),

    "q401_new_vs_returning" -> ((s, dir) => {
      // Monthly new-vs-returning customer split — the acquisition-mix
      // report beside retention cohorts (q218): a customer is "new"
      // exactly in their first-ever order month (per-customer min, one
      // shuffle on the customer key); actives are month-grouped counts.
      // All exact integers, the share one division.
      val o = tbl(s, dir, "orders")
        .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      val per = o.groupBy(col("o_custkey"), col("m")).agg(count(lit(1)).as("n_o"))
      val firstM = per.groupBy(col("o_custkey")).agg(min(col("m")).as("fm"))
      per.join(firstM, Seq("o_custkey"))
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("m") === col("fm"), 1L).otherwise(0L)).as("n_new"))
        .select(col("m").as("month"), col("n_active"), col("n_new"),
          (col("n_active") - col("n_new")).as("n_returning"),
          round(col("n_new").cast("double") / col("n_active").cast("double"), 6)
            .as("new_share"))
    }),

    "q402_pinball_loss" -> ((s, dir) => {
      // Pinball (quantile) loss of the per-brand 0.9-quantile price
      // forecast — the metric that scores a quantile forecast the way
      // Brier (q259) scores a probability. No per-row float sum exists:
      // the loss decomposes into exact BIGINT tail sums ± count × bound
      // (the q399 winsorized discipline), so the mean loss is a fixed
      // double expression of exact integers plus the shared quantile
      // interpolation.
      val tau = 0.9
      val p = tbl(s, dir, "part").select(col("p_brand"),
        (col("p_retailprice").cast(dec) * 100).cast("long").as("c"))
      val b = p.groupBy(col("p_brand"))
        .agg(expr("percentile(CAST(c AS DOUBLE), 0.9)").as("q"))
      p.join(broadcast(b), Seq("p_brand"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
          sum(when(col("c") > col("q"), col("c")).otherwise(0L)).as("shi"),
          sum(when(col("c") > col("q"), 1L).otherwise(0L)).as("nhi"),
          sum(when(col("c") <= col("q"), col("c")).otherwise(0L)).as("slo"),
          sum(when(col("c") <= col("q"), 1L).otherwise(0L)).as("nlo"),
          first(col("q")).as("q"))
        .select(col("p_brand").as("brand"), col("n_parts"),
          round(col("q") / lit(100.0), 4).as("q90_dollars"),
          round((lit(tau) * (col("shi").cast("double") -
            col("nhi").cast("double") * col("q")) +
            (lit(1.0) - lit(tau)) * (col("nlo").cast("double") * col("q") -
              col("slo").cast("double"))) /
            col("n_parts").cast("double") / lit(100.0), 6).as("pinball_loss"))
    }),

    "q410_chow_test" -> ((s, dir) => {
      // Chow structural-break F-test per nation at the series midpoint:
      // fit revenue-on-time OLS to each half and to the pooled series,
      // F = ((SSE_p − SSE₁ − SSE₂)/k) / ((SSE₁+SSE₂)/(n−2k)), k = 2.
      // The day index is a calendar-bounded per-nation window (the
      // q392 class); the five moments per segment are exact
      // decimal(38,0) sums, each SSE the closed form
      // cyy/n − cxy²/(n·cxx) of the centered cross-moments — fixed
      // double expressions, no per-row float anywhere.
      val daily = dailyRevenue(s, dir)
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      val idx = daily.withColumn("t", row_number().over(w).cast("long"))
        .localCheckpoint()
      val nPer = idx.groupBy(col("nation")).agg(count(lit(1)).as("nd"))
      val seg = idx.join(broadcast(nPer), Seq("nation"))
        .withColumn("sgm", when(col("t") * 2 <= col("nd"), 1).otherwise(2))
      val d38 = "decimal(38,0)"
      def moments(df: DataFrame, keys: Seq[Column]) = df.groupBy(keys: _*)
        .agg(count(lit(1)).as("n"),
          sum(col("t").cast(d38)).as("st"), sum(col("c").cast(d38)).as("sy"),
          sum(col("t").cast(d38) * col("t").cast(d38)).as("stt"),
          sum(col("c").cast(d38) * col("c").cast(d38)).as("syy"),
          sum(col("t").cast(d38) * col("c").cast(d38)).as("sty"))
      def sse: Column = {
        val nD = col("n").cast("double")
        val cxx = (col("n").cast(d38) * col("stt") - col("st") * col("st"))
          .cast("double")
        val cyy = (col("n").cast(d38) * col("syy") - col("sy") * col("sy"))
          .cast("double")
        val cxy = (col("n").cast(d38) * col("sty") - col("st") * col("sy"))
          .cast("double")
        cyy / nD - cxy * cxy / (nD * cxx)
      }
      val perSeg = moments(seg, Seq(col("nation"), col("sgm")))
        .select(col("nation"), col("sgm"), sse.as("sse"))
      val s1 = perSeg.filter(col("sgm") === 1)
        .select(col("nation"), col("sse").as("sse1"))
      val s2 = perSeg.filter(col("sgm") === 2)
        .select(col("nation"), col("sse").as("sse2"))
      moments(idx, Seq(col("nation")))
        .select(col("nation"), col("n").as("nd"), sse.as("ssep"))
        .join(s1, Seq("nation")).join(s2, Seq("nation"))
        .select(col("nation"), col("nd").as("n_days"),
          round((col("ssep") - col("sse1") - col("sse2")) / col("ssep"), 6)
            .as("break_share"),
          round(((col("ssep") - col("sse1") - col("sse2")) / lit(2.0)) /
            ((col("sse1") + col("sse2")) / (col("nd") - lit(4)).cast("double")),
            4).as("f_chow"))
    }),

    "q411_granger_lag1" -> ((s, dir) => {
      // Lag-1 Granger test per nation: does yesterday's ORDER COUNT
      // improve today's revenue beyond yesterday's revenue?
      // F = (SSE_r − SSE_u)/(SSE_u/(n−3)) between the restricted
      // (y~y₋₁) and unrestricted (y~y₋₁+x₋₁) OLS fits, both in closed
      // form from exact decimal(38,0) moments via centered
      // cross-moments (c-values, the n² scale cancels in every
      // coefficient) — the 2-predictor normal equations inverted
      // 2×2, fixed double expressions end to end. Lags are
      // calendar-bounded per-nation windows.
      val o = tbl(s, dir, "orders").select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast(dec) * 100).cast("long").as("cents"))
      val c = tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val daily = o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), col("d"))
        .agg(sum(col("cents")).as("y"), count(lit(1)).as("x"))
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      val lagged = daily
        .withColumn("yl", lag(col("y"), 1).over(w))
        .withColumn("xl", lag(col("x"), 1).over(w))
        .filter(col("yl").isNotNull)
      val d38 = "decimal(38,0)"
      def p(a: Column, b: Column) = sum(a.cast(d38) * b.cast(d38))
      val m = lagged.groupBy(col("nation"))
        .agg(count(lit(1)).as("n"),
          sum(col("y").cast(d38)).as("sy"), sum(col("yl").cast(d38)).as("s1"),
          sum(col("xl").cast(d38)).as("s2"),
          p(col("y"), col("y")).as("syy"), p(col("yl"), col("yl")).as("s11"),
          p(col("xl"), col("xl")).as("s22"), p(col("yl"), col("xl")).as("s12"),
          p(col("yl"), col("y")).as("s1y"), p(col("xl"), col("y")).as("s2y"))
      val nD = col("n").cast("double")
      def cc(sab: Column, sa: Column, sb: Column) =
        (col("n").cast(d38) * sab - sa * sb).cast("double")
      val cyy = cc(col("syy"), col("sy"), col("sy"))
      val c11 = cc(col("s11"), col("s1"), col("s1"))
      val c22 = cc(col("s22"), col("s2"), col("s2"))
      val c12 = cc(col("s12"), col("s1"), col("s2"))
      val c1y = cc(col("s1y"), col("s1"), col("sy"))
      val c2y = cc(col("s2y"), col("s2"), col("sy"))
      val det = c11 * c22 - c12 * c12
      val b1 = (c1y * c22 - c2y * c12) / det
      val b2 = (c2y * c11 - c1y * c12) / det
      val sseu = (cyy - b1 * c1y - b2 * c2y) / nD
      val sser = (cyy - c1y * c1y / c11) / nD
      // Degenerate regressors (a constant order count — every sf0.001
      // day has exactly one order — or a singular normal matrix) yield
      // NULL, CASE mirrored in the oracle; the And chain evaluates
      // left-to-right so no guarded division ever runs (q388
      // precedent).
      val valid = c22 > 0.0 && c11 =!= 0.0 && det =!= 0.0
      m.select(col("nation"), col("n").as("n_days"),
        when(valid, round(b2, 4)).otherwise(lit(null).cast("double"))
          .as("beta_xlag"),
        when(valid && sseu > 0.0,
          round((sser - sseu) / (sseu / (nD - lit(3.0))), 4))
          .otherwise(lit(null).cast("double")).as("f_granger"))
    }),

    "q412_periodogram" -> ((s, dir) => {
      // Fixed-frequency periodogram per nation: relative spectral
      // amplitude of the daily revenue series at the weekly (p = 7)
      // and monthly (p = 30) periods — amp_p = √((Σy·cos)² + (Σy·sin)²)
      // / Σy. The trig basis is QueryDsl.fourierWeights — p literal
      // (cos, sin) pairs computed ONCE in Scala and consumed by both
      // engines keyed on day-number mod p (cos/sin are libm territory,
      // the rboWeights discipline). Each product is one IEEE multiply
      // of an exact integer by a shared literal; the sums fold in
      // calendar order on the bounded day grid.
      val daily = dailyRevenue(s, dir)
      def wcase(p: Int, which: Int) =
        QueryDsl.fourierWeights(p).zipWithIndex.foldLeft(lit(0.0)) {
          case (acc, ((cw, sw), k)) =>
            when(pmod(col("t"), lit(p)) === k,
              lit(if (which == 0) cw else sw)).otherwise(acc)
        }
      val terms = daily
        .withColumn("t",
          datediff(col("d"), to_date(lit("1992-01-01"))).cast("long"))
        .select(col("nation"), col("d"), col("c"),
          (col("c").cast("double") * wcase(7, 0)).as("c7"),
          (col("c").cast("double") * wcase(7, 1)).as("s7"),
          (col("c").cast("double") * wcase(30, 0)).as("c30"),
          (col("c").cast("double") * wcase(30, 1)).as("s30"))
      def fold(cn: String) =
        aggregate(array_sort(collect_list(struct(col("d"), col(cn)))),
          lit(0.0), (a, e) => a + e.getField(cn))
      terms.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sy"),
          fold("c7").as("fc7"), fold("s7").as("fs7"),
          fold("c30").as("fc30"), fold("s30").as("fs30"))
        .select(col("nation"), col("n_days"),
          round(sqrt(col("fc7") * col("fc7") + col("fs7") * col("fs7")) /
            col("sy").cast("double"), 6).as("amp_weekly"),
          round(sqrt(col("fc30") * col("fc30") + col("fs30") * col("fs30")) /
            col("sy").cast("double"), 6).as("amp_monthly"))
    }),

    "q417_price_volume_mix" -> ((s, dir) => {
      // Revenue-bridge decomposition per brand, 1996 → 1997: the FP&A
      // "why did revenue move" split ΔR = volume effect (Δq at old
      // price) + price effect (Δp at new volume) — exact by
      // construction for the 2-way bridge. Quantities and gross
      // revenue cents are exact BIGINT cells; the unit prices are one
      // division each, so both effects are fixed double expressions.
      val li = tbl(s, dir, "lineitem").select(col("l_partkey"),
        year(col("l_shipdate")).as("yr"),
        col("l_quantity").cast("long").as("q"),
        (col("l_extendedprice").cast(dec) * 100).cast("long").as("r"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val cells = li.filter(col("yr").isin(1996, 1997))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("yr"))
        .agg(sum(col("q")).as("q"), sum(col("r")).as("r"))
        .localCheckpoint()
      val y0 = cells.filter(col("yr") === 1996)
        .select(col("p_brand"), col("q").as("q0"), col("r").as("r0"))
      val y1 = cells.filter(col("yr") === 1997)
        .select(col("p_brand"), col("q").as("q1"), col("r").as("r1"))
      y0.join(y1, Seq("p_brand"))
        .select(col("p_brand").as("brand"), col("q0"), col("q1"),
          (col("r1") - col("r0")).as("delta_cents"),
          round((col("q1") - col("q0")).cast("double") *
            (col("r0").cast("double") / col("q0").cast("double")) / lit(100.0),
            4).as("volume_effect"),
          round((col("r1").cast("double") / col("q1").cast("double") -
            col("r0").cast("double") / col("q0").cast("double")) *
            col("q1").cast("double") / lit(100.0), 4).as("price_effect"))
    }),

    "q418_shift_share" -> ((s, dir) => {
      // Shift-share decomposition of each nation's 1996 → 1997 revenue
      // growth into national, industry-mix (brand portfolio), and
      // competitive components: Δe_n = Σ_b e₀·G + e₀·(G_b − G) +
      // e₀·(g_nb − G_b) — an exact identity over the joined cells.
      // Cells are exact BIGINT cents; growth rates are single
      // divisions; the ≤25 per-nation brand terms fold brand-ordered.
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_partkey"), year(col("l_shipdate")).as("yr"),
        (col("l_extendedprice").cast(dec) * 100).cast("long").as("r"))
      val o = tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val cell = li.filter(col("yr").isin(1996, 1997))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("n_name").as("nation"), col("p_brand"), col("yr"))
        .agg(sum(col("r")).as("e"))
        .localCheckpoint()
      val nb = cell.filter(col("yr") === 1996)
        .select(col("nation"), col("p_brand"), col("e").as("e0"))
        .join(cell.filter(col("yr") === 1997)
          .select(col("nation"), col("p_brand"), col("e").as("e1")),
          Seq("nation", "p_brand"))
        .localCheckpoint()
      val br = nb.groupBy(col("p_brand"))
        .agg(sum(col("e0")).as("b0"), sum(col("e1")).as("b1"))
      val tot = nb.agg(sum(col("e0")).as("t0"), sum(col("e1")).as("t1"))
      val gAll = col("t1").cast("double") / col("t0").cast("double") - lit(1.0)
      val gBr = col("b1").cast("double") / col("b0").cast("double") - lit(1.0)
      val gNb = col("e1").cast("double") / col("e0").cast("double") - lit(1.0)
      // Unrounded terms (the r11 sf10 sweep find): at sf10 a term
      // reaches ~1e9 where ulp ≈ 2.4e-7 — ON the 6-dp rounding's
      // decision edge, and one of the 625 cells rounded differently
      // across engines (the q294 step-round mechanism). The terms are
      // pure IEEE products of exact ints by exact-int ratios — no libm
      // anywhere — so they are bit-identical WITHOUT any round.
      val terms = nb.join(broadcast(br), Seq("p_brand"))
        .crossJoin(broadcast(tot))
        .select(col("nation"), col("p_brand"), col("e0"), col("e1"),
          (col("e0").cast("double") * gAll).as("tn"),
          (col("e0").cast("double") * (gBr - gAll)).as("tm"),
          (col("e0").cast("double") * (gNb - gBr)).as("tc"))
      def fold(cn: String) =
        aggregate(array_sort(collect_list(struct(col("p_brand"), col(cn)))),
          lit(0.0), (a, e) => a + e.getField(cn))
      terms.groupBy(col("nation"))
        .agg(sum(col("e0")).as("e0_cents"), sum(col("e1")).as("e1_cents"),
          fold("tn").as("fn"), fold("tm").as("fm"), fold("tc").as("fc"))
        // unrounded (roundlint r11): Σ(6-dp terms)/100 keeps a fine
        // decimal grid that contains 2-dp half boundaries, and the
        // cents magnitudes grow with the corpus (q333 class) — the
        // folds and the /100 are bit-identical both engines
        .select(col("nation"), col("e0_cents"), col("e1_cents"),
          (col("fn") / lit(100.0)).as("national_effect"),
          (col("fm") / lit(100.0)).as("mix_effect"),
          (col("fc") / lit(100.0)).as("competitive_effect"))
    }),

    "q419_tukey_range" -> ((s, dir) => {
      // Tukey–Kramer studentized-range statistic for every brand pair:
      // q_ij = |m_i − m_j| / √((MSW/2)·(1/n_i + 1/n_j)) with MSW from
      // the same exact one-way ANOVA moments q413 folds — the post-hoc
      // "which pairs differ" companion of the global F (q282). The
      // pair frame is catalog-bounded (25² brands); every input to the
      // doubles is an exact integer.
      val d38 = "decimal(38,0)"
      val p = tbl(s, dir, "part").select(col("p_brand"),
        (col("p_retailprice").cast(dec) * 100).cast("long").as("x"))
      val g = p.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("nj"), sum(col("x").cast(d38)).as("sx"),
          sum(col("x").cast(d38) * col("x").cast(d38)).as("sxx"))
        .localCheckpoint()
      val wterms = g.select(col("p_brand"),
        ((col("nj").cast(d38) * col("sxx") - col("sx") * col("sx"))
          .cast("double") / col("nj").cast("double")).as("wj"))
      val msw = wterms
        .agg(aggregate(array_sort(collect_list(struct(col("p_brand"),
          col("wj")))), lit(0.0), (a, e) => a + e.getField("wj")).as("ssw"))
        .crossJoin(broadcast(
          g.agg(sum(col("nj")).as("n"), count(lit(1)).as("j"))))
        .select((col("ssw") /
          (col("n").cast("double") - col("j").cast("double"))).as("msw"))
      val a = g.select(col("p_brand").as("brand_a"), col("nj").as("na"),
        col("sx").as("sxa"))
      val b = g.select(col("p_brand").as("brand_b"), col("nj").as("nb"),
        col("sx").as("sxb"))
      val ma = col("sxa").cast("double") / col("na").cast("double")
      val mb = col("sxb").cast("double") / col("nb").cast("double")
      a.join(b, col("brand_a") < col("brand_b")).crossJoin(broadcast(msw))
        .select(col("brand_a"), col("brand_b"),
          round(abs(ma - mb) / lit(100.0), 4).as("mean_diff_dollars"),
          round(abs(ma - mb) /
            sqrt(col("msw") / lit(2.0) *
              (lit(1.0) / col("na").cast("double") +
                lit(1.0) / col("nb").cast("double"))), 4).as("q_stat"))
    }),

    "q423_rsi" -> ((s, dir) => {
      // 14-day RSI (simple-average form) regime counts per nation:
      // gains/losses are exact BIGINT cent deltas over the calendar
      // grid, the rolling sums are 14-row window frames (only full
      // frames count, the q366 warm-up rule), RS = Σgain/Σloss one
      // division, and the output is the count of overbought (> 70) /
      // oversold (< 30) days — integer comparisons on identical
      // doubles, so no per-day float ever aggregates.
      val daily = dailyRevenue(s, dir)
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      val dlt = daily.withColumn("delta", col("c") - lag(col("c"), 1).over(w))
        .filter(col("delta").isNotNull)
        .select(col("nation"), col("d"),
          greatest(col("delta"), lit(0L)).as("gain"),
          greatest(-col("delta"), lit(0L)).as("loss"))
      val fw = Window.partitionBy(col("nation")).orderBy(col("d"))
        .rowsBetween(-13, 0)
      val rsi = dlt
        .withColumn("nw", count(lit(1)).over(fw))
        .withColumn("sg", sum(col("gain")).over(fw))
        .withColumn("sl", sum(col("loss")).over(fw))
        .filter(col("nw") === 14)
        .select(col("nation"),
          when(col("sl") === 0, lit(100.0))
            .otherwise(lit(100.0) - lit(100.0) /
              (lit(1.0) + col("sg").cast("double") / col("sl").cast("double")))
            .as("rsi"))
      rsi.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("rsi") > 70.0, 1L).otherwise(0L)).as("n_overbought"),
          sum(when(col("rsi") < 30.0, 1L).otherwise(0L)).as("n_oversold"))
        .select(col("nation"), col("n_windows"), col("n_overbought"),
          col("n_oversold"),
          round(col("n_overbought").cast("double") /
            col("n_windows").cast("double"), 6).as("share_overbought"))
    }),

    "q424_kendall_w" -> ((s, dir) => {
      // Kendall's coefficient of concordance W across the three yearly
      // brand-revenue rankings (1995/1996/1997): do the years agree on
      // the brand order? Ranks are row_numbers over exact cents
      // (brand tie-break), the rank-sum deviations stay INTEGER via
      // T = Σ(2R_j − m(n+1))² = 4·ΣD², and W = 3T/(m²(n³−n)) is ONE
      // double division — no float until the last step.
      val li = tbl(s, dir, "lineitem").select(col("l_partkey"),
        year(col("l_shipdate")).as("yr"),
        (col("l_extendedprice").cast(dec) * 100).cast("long").as("r"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val cells = li.filter(col("yr").isin(1995, 1996, 1997))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("yr")).agg(sum(col("r")).as("rev"))
      val w = Window.partitionBy(col("yr"))
        .orderBy(col("rev").desc, col("p_brand").asc)
      val ranks = cells.withColumn("rk", row_number().over(w).cast("long"))
      val rsums = ranks.groupBy(col("p_brand"))
        .agg(sum(col("rk")).as("rj"), count(lit(1)).as("m"))
        .filter(col("m") === 3)
        .localCheckpoint()
      val nBr = rsums.agg(count(lit(1)).as("n"))
      val dev = col("rj") * 2 - lit(3) * (col("n") + 1)
      val t = rsums.crossJoin(broadcast(nBr))
        .select(col("n"), (dev * dev).as("d2"))
        .groupBy(col("n")).agg(sum(col("d2")).as("t"))
      t.select(col("n").as("n_brands"), lit(3L).as("m_years"),
        col("t").as("t_stat"),
        round(lit(3.0) * col("t").cast("double") /
          (lit(9.0) * (col("n").cast("double") * col("n").cast("double") *
            col("n").cast("double") - col("n").cast("double"))), 6).as("w"))
    }),

    "q425_mase_naive" -> ((s, dir) => {
      // Seasonal-naive vs naive forecast error on the daily grid:
      // MAE of the lag-7 forecast over MAE of the lag-1 forecast per
      // nation — the MASE-style scale-free skill score that says
      // whether weekly seasonality actually helps (ratio < 1) before
      // anyone fits a model (q226/q275 evaluate the fitted ones).
      // Absolute errors are exact BIGINT cents; each MAE is one
      // division.
      val daily = dailyRevenue(s, dir)
      val w = Window.partitionBy(col("nation")).orderBy(col("d"))
      val lagged = daily
        .withColumn("e1", abs(col("c") - lag(col("c"), 1).over(w)))
        .withColumn("e7", abs(col("c") - lag(col("c"), 7).over(w)))
      lagged.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("e1")).as("s1"), count(col("e1")).as("n1"),
          sum(col("e7")).as("s7"), count(col("e7")).as("n7"))
        .select(col("nation"), col("n_days"),
          round(col("s1").cast("double") / col("n1").cast("double") /
            lit(100.0), 4).as("mae_naive"),
          round(col("s7").cast("double") / col("n7").cast("double") /
            lit(100.0), 4).as("mae_seasonal"),
          round((col("s7").cast("double") / col("n7").cast("double")) /
            (col("s1").cast("double") / col("n1").cast("double")), 6)
            .as("mase_ratio"))
    }),

    "q426_rank_aggregation" -> ((s, dir) => {
      // Borda + Condorcet aggregation of the three yearly brand-revenue
      // rankings (the q424 grid): Borda score Σ(n − rank) across
      // years, pairwise win = lower rank in a majority of years,
      // Condorcet winner = beats every other brand — the social-choice
      // layer over catalog-bounded integer ranks; no float anywhere.
      // Universe = brands ranked in ALL THREE years (the q424 count = 3
      // discipline), ranked within that universe — so n is the one true
      // candidate count for both the Borda Σ(n − rank) and the
      // Condorcet n − 1 test even when a brand sells in only some years
      // (possible at tiny scale factors; the r9 cut pinned n to the
      // 1995 ranking and summed Borda over a brand's present years
      // only, which skews both scores for a partially-ranked brand).
      val li = tbl(s, dir, "lineitem").select(col("l_partkey"),
        year(col("l_shipdate")).as("yr"),
        (col("l_extendedprice").cast(dec) * 100).cast("long").as("r"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val cells0 = li.filter(col("yr").isin(1995, 1996, 1997))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("yr")).agg(sum(col("r")).as("rev"))
      val universe = cells0.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("ny")).filter(col("ny") === 3)
        .select(col("p_brand"))
      val cells = cells0.join(broadcast(universe), Seq("p_brand"))
      val w = Window.partitionBy(col("yr"))
        .orderBy(col("rev").desc, col("p_brand").asc)
      val ranks = cells.withColumn("rk", row_number().over(w).cast("long"))
        .localCheckpoint()
      val nBr = universe.agg(count(lit(1)).cast("long").as("n"))
      val borda = ranks.crossJoin(broadcast(nBr))
        .groupBy(col("p_brand")).agg(sum(col("n") - col("rk")).as("borda"))
      val a = ranks.select(col("yr"), col("p_brand").as("bi"), col("rk").as("ri"))
      val b = ranks.select(col("yr"), col("p_brand").as("bj"), col("rk").as("rj"))
      val beats = a.join(b, Seq("yr")).filter(col("bi") =!= col("bj"))
        .groupBy(col("bi"), col("bj"))
        .agg(sum(when(col("ri") < col("rj"), 1L).otherwise(0L)).as("wins"))
        .filter(col("wins") >= 2)
        .groupBy(col("bi")).agg(count(lit(1)).as("n_beats"))
      borda.join(beats.withColumnRenamed("bi", "p_brand"), Seq("p_brand"), "left")
        .crossJoin(broadcast(nBr))
        .select(col("p_brand").as("brand"), col("borda"),
          coalesce(col("n_beats"), lit(0L)).as("n_pairwise_wins"),
          (coalesce(col("n_beats"), lit(0L)) === (col("n") - 1))
            .as("condorcet_winner"))
    }),

    "q427_bradley_terry" -> ((s, dir) => {
      // Bradley–Terry strengths from pairwise brand "matches" (one per
      // nation, 1997 revenue decides the winner), fitted by THREE
      // unrolled MM iterations p_i ← W_i / Σ_j n_ij/(p_i+p_j) from
      // p = 1 — the paired-comparison model behind every ranking
      // system, on a catalog-bounded (25²) win matrix. Win counts are
      // exact; each iteration's 24 per-brand terms round on the 9-dp
      // grid and fold opponent-ordered, so three iterations stay
      // bit-deterministic in both engines.
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_partkey"), year(col("l_shipdate")).as("yr"),
        (col("l_extendedprice").cast(dec) * 100).cast("long").as("r"))
      val o = tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val cell = li.filter(col("yr") === 1997)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("n_name").as("nation"), col("p_brand"))
        .agg(sum(col("r")).as("e"))
        .localCheckpoint()
      val i = cell.select(col("nation"), col("p_brand").as("bi"), col("e").as("ei"))
      val j = cell.select(col("nation"), col("p_brand").as("bj"), col("e").as("ej"))
      val wins = i.join(j, Seq("nation")).filter(col("bi") =!= col("bj"))
        .groupBy(col("bi"), col("bj"))
        .agg(sum(when(col("ei") > col("ej"), 1L).otherwise(0L)).as("wij"),
          count(lit(1)).as("nij"))
        .localCheckpoint()
      val wt = wins.groupBy(col("bi")).agg(sum(col("wij")).as("wtot"))
        .localCheckpoint()
      def iter(pd: DataFrame): DataFrame = {
        val pi = pd.select(col("brand").as("bi"), col("p").as("pi"))
        val pj = pd.select(col("brand").as("bj"), col("p").as("pj"))
        wins.join(broadcast(pi), Seq("bi")).join(broadcast(pj), Seq("bj"))
          .select(col("bi"), col("bj"),
            round(col("nij").cast("double") / (col("pi") + col("pj")), 9)
              .as("t"))
          .groupBy(col("bi"))
          .agg(aggregate(array_sort(collect_list(struct(col("bj"), col("t")))),
            lit(0.0), (acc, e) => acc + e.getField("t")).as("d"))
          .join(wt, Seq("bi"))
          .select(col("bi").as("brand"),
            (col("wtot").cast("double") / col("d")).as("p"))
      }
      val p0 = wt.select(col("bi").as("brand"), lit(1.0).as("p"))
      val p3 = iter(iter(iter(p0)))
      val psum = p3.agg(aggregate(array_sort(collect_list(struct(col("brand"),
        col("p")))), lit(0.0), (acc, e) => acc + e.getField("p")).as("ps"))
      p3.crossJoin(broadcast(psum))
        .join(wt.withColumnRenamed("bi", "brand"), Seq("brand"))
        .select(col("brand"), col("wtot").as("wins"),
          round(col("p") / col("ps"), 6).as("bt_score"))
    }),

    "q433_topsis" -> ((s, dir) => {
      // Entropy-weighted TOPSIS ranking of brands on three benefit
      // criteria (mean extended price per line item — price × quantity,
      // not unit price —, total quantity sold, distinct buyers):
      // Shannon-entropy column weights, vector-normalized
      // decision matrix, closeness d⁻/(d⁺+d⁻) to the ideal/anti-ideal
      // points — the multi-criteria decision layer on a
      // catalog-bounded 25×3 matrix. Column folds are brand-ordered;
      // entropy terms round on the 9-dp grid.
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_partkey"), col("l_quantity").cast("long").as("q"),
        (col("l_extendedprice").cast(dec) * 100).cast("long").as("r"))
      val o = tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("q"), col("r"), col("o_custkey"))
      // Two-level re-aggregation instead of countDistinct-in-the-agg:
      // one map-combined shuffle keyed (brand, buyer) carries the
      // plain sums AND makes the distinct-buyer count a row count of
      // the 25×|buyers| intermediate — countDistinct mixed with plain
      // sums would Expand the fact rows ×2 through the shuffle (the
      // first probe paid 19× in the second decade for it).
      val lvl1 = joined.groupBy(col("p_brand"), col("o_custkey"))
        .agg(sum(col("r")).as("sp1"), count(lit(1)).as("n1"),
          sum(col("q")).as("sq1"))
      val base = lvl1.groupBy(col("p_brand"))
        .agg(sum(col("sp1")).as("sp"), sum(col("n1")).as("n"),
          sum(col("sq1")).as("sq"), count(lit(1)).as("nc"))
      val m = base.select(col("p_brand"),
        (col("sp").cast("double") / col("n").cast("double")).as("x1"),
        col("sq").cast("double").as("x2"), col("nc").cast("double").as("x3"))
        .localCheckpoint()
      def fold(w: Column, nm: String) =
        aggregate(array_sort(collect_list(struct(col("p_brand"), w.as(nm)))),
          lit(0.0), (a, e) => a + e.getField(nm))
      val sums = m.agg(
        fold(col("x1") * col("x1"), "s1").as("ss1"),
        fold(col("x2") * col("x2"), "s2").as("ss2"),
        fold(col("x3") * col("x3"), "s3").as("ss3"),
        fold(col("x1"), "u1").as("t1"), fold(col("x2"), "u2").as("t2"),
        fold(col("x3"), "u3").as("t3"), count(lit(1)).as("nb"))
      def eterm(x: String, t: String) =
        round(col(x) / col(t) * log(col(x) / col(t)), 9)
      val ent = m.crossJoin(broadcast(sums))
        .agg(fold(eterm("x1", "t1"), "e1").as("f1"),
          fold(eterm("x2", "t2"), "e2").as("f2"),
          fold(eterm("x3", "t3"), "e3").as("f3"))
      val lnn = log(col("nb").cast("double"))
      def u(f: String) = lit(1.0) - (-col(f) / lnn)
      val wsum = u("f1") + u("f2") + u("f3")
      def v(x: String, ss: String, f: String) =
        col(x) / sqrt(col(ss)) * (u(f) / wsum)
      val scored = m.crossJoin(broadcast(sums)).crossJoin(broadcast(ent))
        .select(col("p_brand"), v("x1", "ss1", "f1").as("v1"),
          v("x2", "ss2", "f2").as("v2"), v("x3", "ss3", "f3").as("v3"))
        .localCheckpoint()
      val ideals = scored.agg(max(col("v1")).as("i1"), min(col("v1")).as("a1"),
        max(col("v2")).as("i2"), min(col("v2")).as("a2"),
        max(col("v3")).as("i3"), min(col("v3")).as("a3"))
      def dist(c1: Column, c2: Column, c3: Column) =
        sqrt(c1 * c1 + c2 * c2 + c3 * c3)
      val dp = dist(col("v1") - col("i1"), col("v2") - col("i2"),
        col("v3") - col("i3"))
      val dm = dist(col("v1") - col("a1"), col("v2") - col("a2"),
        col("v3") - col("a3"))
      scored.crossJoin(broadcast(ideals))
        .select(col("p_brand").as("brand"), round(dp, 6).as("d_plus"),
          round(dm, 6).as("d_minus"),
          round(dm / (dp + dm), 6).as("topsis_closeness"))
    }),

    "q436_topsis_kmv" -> ((s, dir) => {
      // Sketch-faced twin of q433 (the r9 verdict's standing worst sf10
      // slope: the exact distinct-buyer criterion is an honest
      // 50M-group (brand, buyer) shuffle, 21.7×/100×). The distinct
      // count becomes a per-brand KMV sketch riding IN THE SAME AGG as
      // the plain sums — one map-combined 25-group shuffle total, no
      // buyer-level key anywhere: SketchAggregates.kmvDistinct (native
      // TypedImperativeAggregate, q340's sketch algebra) keeps the
      // k = 256 smallest DISTINCT md5 unit hashes of the buyer key per
      // brand (O(k) state, O(1) steady-state reject) and evals to
      // (k−1)/h_k when full / the exact count otherwise. (A first cut
      // ran the sketch as a SECOND TopKPerKey-distinct scan — probed at
      // sf10 it paid the lineitem⨝orders shuffle twice and matched
      // q433's runtime; the single-agg form is the re-plan.) A set's
      // k smallest distinct values don't depend on arrival order or
      // multiplicity, so the sketch is deterministic and the oracle
      // replays it bit-for-bit: this face pins the DECLARED sketch
      // semantics while exact q433 stays the oracle-of-record for true
      // counts (the q193 precedent); WarehouseSpec pins the estimate
      // within KMV's expected relative error of q433's exact nc at the
      // gate sf. x1/x2 and the whole TOPSIS finish are q433's, with x3
      // the estimate (one IEEE division of md5-identical doubles — no
      // rounding needed to agree cross-engine).
      val li = tbl(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_partkey"), col("l_quantity").cast("long").as("q"),
        (col("l_extendedprice").cast(dec) * 100).cast("long").as("r"))
      val o = tbl(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("q"), col("r"), col("o_custkey"))
      val m = joined.groupBy(col("p_brand"))
        .agg(sum(col("r")).as("sp"), count(lit(1)).as("n"),
          sum(col("q")).as("sq"),
          graft.plans.SketchAggregates.kmvDistinct(
            graft.plans.TextKernels.unitHashNative(concat(lit("kmvb_"),
              col("o_custkey").cast("string"))), 256).as("x3"))
        .select(col("p_brand"),
          (col("sp").cast("double") / col("n").cast("double")).as("x1"),
          col("sq").cast("double").as("x2"), col("x3"))
        .localCheckpoint()
      def fold(w: Column, nm: String) =
        aggregate(array_sort(collect_list(struct(col("p_brand"), w.as(nm)))),
          lit(0.0), (a, e) => a + e.getField(nm))
      val sums = m.agg(
        fold(col("x1") * col("x1"), "s1").as("ss1"),
        fold(col("x2") * col("x2"), "s2").as("ss2"),
        fold(col("x3") * col("x3"), "s3").as("ss3"),
        fold(col("x1"), "u1").as("t1"), fold(col("x2"), "u2").as("t2"),
        fold(col("x3"), "u3").as("t3"), count(lit(1)).as("nb"))
      def eterm(x: String, t: String) =
        round(col(x) / col(t) * log(col(x) / col(t)), 9)
      val ent = m.crossJoin(broadcast(sums))
        .agg(fold(eterm("x1", "t1"), "e1").as("f1"),
          fold(eterm("x2", "t2"), "e2").as("f2"),
          fold(eterm("x3", "t3"), "e3").as("f3"))
      val lnn = log(col("nb").cast("double"))
      def u(f: String) = lit(1.0) - (-col(f) / lnn)
      val wsum = u("f1") + u("f2") + u("f3")
      def v(x: String, ss: String, f: String) =
        col(x) / sqrt(col(ss)) * (u(f) / wsum)
      val scored = m.crossJoin(broadcast(sums)).crossJoin(broadcast(ent))
        .select(col("p_brand"), col("x3"), v("x1", "ss1", "f1").as("v1"),
          v("x2", "ss2", "f2").as("v2"), v("x3", "ss3", "f3").as("v3"))
        .localCheckpoint()
      val ideals = scored.agg(max(col("v1")).as("i1"), min(col("v1")).as("a1"),
        max(col("v2")).as("i2"), min(col("v2")).as("a2"),
        max(col("v3")).as("i3"), min(col("v3")).as("a3"))
      def dist(c1: Column, c2: Column, c3: Column) =
        sqrt(c1 * c1 + c2 * c2 + c3 * c3)
      val dp = dist(col("v1") - col("i1"), col("v2") - col("i2"),
        col("v3") - col("i3"))
      val dm = dist(col("v1") - col("a1"), col("v2") - col("a2"),
        col("v3") - col("a3"))
      scored.crossJoin(broadcast(ideals))
        .select(col("p_brand").as("brand"), col("x3").as("est_buyers"),
          round(dp, 6).as("d_plus"), round(dm, 6).as("d_minus"),
          round(dm / (dp + dm), 6).as("topsis_closeness"))
    }),

    // ── Spectral / design-based-sampling tier (q467/q476, round 11) ─────

    "q467_spectral_entropy" -> ((s, dir) => {
      // Spectral entropy of the weekly cycle per nation: power at the
      // three distinct period-7 harmonics (j and 7−j alias, so j=1..3
      // carries the whole discrete spectrum above DC), normalized to a
      // distribution, H = −Σ p_j ln p_j / ln 3 ∈ [0,1] — 0 = one pure
      // tone (a rigid weekly rhythm), 1 = flat (no weekly structure).
      // The trig basis reuses QueryDsl.fourierWeights(7) indexed by
      // (j·t) mod 7 — identical shared literals both engines, no libm
      // trig anywhere (the q412 discipline); ln runs once per harmonic
      // at the very end, guarded by the 6-dp output round.
      val daily = dailyRevenue(s, dir)
      def wcase(j: Int, which: Int) =
        QueryDsl.fourierWeights(7).zipWithIndex.foldLeft(lit(0.0)) {
          case (acc, ((cw, sw), k)) =>
            when(pmod(col("t") * lit(j), lit(7)) === k,
              lit(if (which == 0) cw else sw)).otherwise(acc)
        }
      val terms = daily
        .withColumn("t",
          datediff(col("d"), to_date(lit("1992-01-01"))).cast("long"))
        .select(Seq(col("nation"), col("d")) ++ (1 to 3).flatMap { j =>
          Seq((col("c").cast("double") * wcase(j, 0)).as(s"c$j"),
            (col("c").cast("double") * wcase(j, 1)).as(s"s$j"))
        }: _*)
      def fold(cn: String) =
        aggregate(array_sort(collect_list(struct(col("d"), col(cn)))),
          lit(0.0), (a, e) => a + e.getField(cn))
      val harmonicFolds = (1 to 3).flatMap { j =>
        Seq(fold(s"c$j").as(s"fc$j"), fold(s"s$j").as(s"fs$j"))
      }
      val sums = terms.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_days"), harmonicFolds: _*)
      val withP = sums
        .withColumn("p1", col("fc1") * col("fc1") + col("fs1") * col("fs1"))
        .withColumn("p2", col("fc2") * col("fc2") + col("fs2") * col("fs2"))
        .withColumn("p3", col("fc3") * col("fc3") + col("fs3") * col("fs3"))
        .withColumn("pt", col("p1") + col("p2") + col("p3"))
      def ent(c: Column): Column =
        when(c > 0, -(c / col("pt")) * log(c / col("pt"))).otherwise(lit(0.0))
      withP.select(col("nation"), col("n_days"),
        round((ent(col("p1")) + ent(col("p2")) + ent(col("p3")))
          / log(lit(3.0)), 6).as("spectral_entropy"))
    }),

    "q476_horvitz_thompson" -> ((s, dir) => {
      // Horvitz–Thompson total estimator under deterministic Poisson
      // PPS sampling: π_i = min(1, m·x_i/Σx) with m = 200 (expected
      // sample size), include order i iff its md5 unit hash < π_i —
      // the content-stable inclusion rule (q130's split-by-hash
      // property: an order's fate never changes as the corpus grows).
      // HT total = Σ_sample x_i/π_i is unbiased; the output carries the
      // exact true total beside it plus the realized sample size. π and
      // the HT terms are identical IEEE chains of exact ints; the
      // sample-term fold runs in orderkey order. The estimated total is
      // the corpus LINEITEM count (y correlated with, but distinct
      // from, the size measure x — a size-degenerate y would make every
      // uncapped HT term the constant Σx/m).
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"),
          expr(s"cast(cast(o_totalprice as $dec) * 100 as bigint)").as("x"))
      val ly = tbl(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("y"))
      val oy = o.join(ly, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), col("x"),
          coalesce(col("y"), lit(0L)).as("y"))
      val tot = oy.agg(sum(col("x")).as("tx"), sum(col("y")).as("ty"))
      def d(c: String): Column = col(c).cast("double")
      val withPi = oy.crossJoin(broadcast(tot))
        .withColumn("pi", least(lit(1.0),
          lit(200.0) * d("x") / d("tx")))
        .withColumn("u", graft.plans.TextKernels.unitHashNative(
          concat(lit("ht_"), col("o_orderkey").cast("string"))))
        .filter(col("u") < col("pi"))
      withPi.agg(count(lit(1)).as("n_sampled"),
          aggregate(array_sort(collect_list(struct(col("o_orderkey"),
            (d("y") / col("pi")).as("t")))), lit(0.0),
            (acc, e) => acc + e.getField("t")).as("ht"),
          max(col("ty")).as("true_total"))
        .select(col("n_sampled"), col("ht").as("ht_total"),
          col("true_total"),
          (col("ht") / col("true_total").cast("double")).as("ht_ratio"))
    }),

    // ── Round-12 tier: event-stream temporal statistics ─────────────────

    "q492_fano_burstiness" -> ((s, dir) => {
      // Fano factor (variance-to-mean of DAILY event counts) per user —
      // the burstiness gauge: ≈1 Poisson, ≫1 bursty sessions, the
      // temporal-shape sibling of q42's sessionizer. Per-user moments
      // are exact integers off one (user, day) pre-aggregate; the
      // top-20 burstiest (n ≥ 5 active days) is TakeOrderedAndProject
      // on the one-division double with user_id tiebreak.
      val dayc = Tables.events(s, dir)
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val st = dayc.groupBy(col("user_id"))
        .agg(count(lit(1)).as("nd"), sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("scc"))
        .filter(col("nd") >= 5)
      def d(c: String): Column = col(c).cast("double")
      st.select(col("user_id"), col("nd").as("n_days"),
          col("sc").as("n_events"),
          (((d("scc") - d("sc") * d("sc") / d("nd")) / d("nd"))
            / (d("sc") / d("nd"))).as("fano"))
        .orderBy(col("fano").desc, col("user_id")).limit(20)
    }),

    "q493_interarrival_rate" -> ((s, dir) => {
      // Exponential-MLE event rate per user: λ̂ = (n−1)/span — the
      // inter-arrival sum TELESCOPES to last−first, so the whole MLE is
      // three exact integers per user off one map-combinable aggregate
      // (no ordered gap stream at any scale). Top-20 most active users
      // by (n_events desc, user_id), rate as one division.
      val ev = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val st = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), min(col("us")).as("t0"),
          max(col("us")).as("t1"))
        .filter(col("n") >= 2 && col("t1") > col("t0"))
      st.select(col("user_id"), col("n").as("n_events"),
          (col("t1") - col("t0")).as("span_us"),
          ((col("n") - 1).cast("double") * lit(86400000000.0)
            / (col("t1") - col("t0")).cast("double")).as("events_per_day"))
        .orderBy(col("n_events").desc, col("user_id")).limit(20)
    }),
  )

  /** Daily order revenue in exact cents per (nation, day) — the shared
    * calendar-bounded grid of the finance tier (q365–q367).
    */
  private[graft] def dailyRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders").select(col("o_custkey"),
      to_date(col("o_orderdate")).as("d"),
      (col("o_totalprice").cast(dec) * 100).cast("long").as("cents"))
    val c = tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val n = tbl(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("d"))
      .agg(sum(col("cents")).as("c"))
  }

  /** Per-day EWMA state over the daily grid (q442/q443): x = cents as
    * double, xprev = yesterday's x, sprev = EWMA of the strict prefix
    * (NULL on day 1), snow = EWMA including today, rn/nd for final-row
    * selection. The recurrence s ← 0.25·x + 0.75·s replays as an
    * ordered fold whose FIRST element is the init — exactly DuckDB
    * list_reduce's convention, mirrored here with element_at + slice —
    * so both engines execute the identical double-op sequence. Cost is
    * O(days²) per nation: calendar²-bounded, corpus-size-independent.
    */
  private def ewmaPrefix(daily0: DataFrame): DataFrame = {
    // Checkpointed (r13): the daily grid (an orders⋈customer⋈nation
    // aggregate) feeds BOTH the per-nation series fold and the per-day
    // row stream — one build, not two.
    val daily = daily0.localCheckpoint()
    val w = Window.partitionBy(col("nation")).orderBy(col("d"))
    // The whole per-nation EWMA SERIES is built ONCE as an array-growing
    // fold over the day-ordered values (se[1] = x₁; se[k] = 0.25·x_k +
    // 0.75·se[k−1] — the same double-op sequence as before), then each
    // daily row just indexes it by row number. The first cut re-folded
    // the prefix PER ROW (filter+transform of the struct array on every
    // one of the 60k grid rows) — the sf0.1 probe measured q442/q443 at
    // 42/85 s for what is a 2-second grid computation; this form does
    // the O(days²) element copies once per nation, in one 25-row pass.
    val ser = daily.groupBy(col("nation"))
      .agg(array_sort(collect_list(struct(col("d"),
        col("c").cast("double").as("x")))).as("a"))
      .select(col("nation"),
        aggregate(transform(col("a"), e => e.getField("x")),
          typedLit(Seq.empty[Double]),
          (acc, x) => concat(acc, array(when(size(acc) === 0, x)
            .otherwise(lit(0.25) * x + lit(0.75) * element_at(acc, -1)))))
          .as("se"))
    daily.select(col("nation"), col("d"), col("c").cast("double").as("x"))
      .withColumn("xprev", lag(col("x"), 1).over(w))
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(ser), Seq("nation"))
      .withColumn("nd", count(lit(1))
        .over(Window.partitionBy(col("nation"))).cast("long"))
      .withColumn("sprev", when(col("rn") > 1,
        element_at(col("se"), (col("rn") - 1).cast("int"))))
      .withColumn("snow", element_at(col("se"), col("rn").cast("int")))
      .drop("se")
  }
}
