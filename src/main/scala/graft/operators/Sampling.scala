package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: per-stratum
  * downsampling and token-budget chunk assignment.
  *
  * Both are DETERMINISTIC pure functions of the input — no RNG, no
  * partition-order dependence — so results are identical under stage
  * retry, across cluster sizes, and across engines (exact DuckDB oracles
  * in SparkEntry q76/q77). That property is what makes a 100 TB sampling
  * run auditable: re-running any slice reproduces the same keep set.
  */
object Sampling {

  /** Unit-interval hash of an id: first 8 md5 hex digits / 2^32 — the
    * same construction the KMV sketch uses (identical on any engine with
    * md5, unlike xxhash64/rand seeds).
    */
  def unitHash(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0

  /** Keep a row iff `unitHash(id) < rate(stratum)` — per-stratum
    * downsampling (e.g. keep 50% of English, 20% of everything else).
    * One codegen'd filter at scan time; no shuffle, no driver state.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(unitHash(col(idCol)) < rate)
  }

  /** Concatenate-and-chunk packing (how LLM pretraining typically packs
    * documents into fixed-size sequences): within each group, documents
    * ordered by `idCol` form one token stream; a document's `pack_id` is
    * the chunk index of its first token, `prefix_tokens div budget`.
    * One window cumsum per group — a single shuffle by group key.
    */
  def chunkAssignments(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tokenCountCol: String,
      budget: Int): DataFrame = {
    val prev = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("prefix_tokens",
        coalesce(sum(col(tokenCountCol)).over(prev), lit(0L)))
      .withColumn("pack_id", expr(s"prefix_tokens div $budget"))
  }

  /** Fixed-SIZE per-stratum sample: exactly `k` rows per stratum (fewer
    * if the stratum is smaller), chosen as the k smallest [[unitHash]]
    * values — deterministic, retry-stable, and independent of partition
    * layout like the rate-based form, but with a guaranteed output size
    * (what an eval-set builder needs, where "0.1%" of a surging stratum
    * must not balloon). One window over the hash order per stratum —
    * a single shuffle by stratum key.
    */
  def stratumTopK(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(unitHash(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic corpus mixing to a target distribution (the static
    * DoReMi/pretraining-mix shape): given target weights per stratum,
    * find the largest corpus subset whose token mass matches the target
    * proportions, then keep it via the same [[unitHash]] filter
    * stratified sampling uses.
    *
    * Math: with `t_s` tokens available in stratum `s` and target weight
    * `w_s`, the binding stratum sets the scale `S = min_s(t_s / w_s)`;
    * stratum `s` keeps `rate_s = S * w_s / t_s` of its tokens (the
    * binding stratum keeps everything). Per-stratum totals are one tiny
    * aggregate collected to the driver (stratum count rows — the
    * config-loop pattern), rates fold into ONE codegen'd filter; the
    * data pass itself is a single scan, no shuffle.
    *
    * Strata missing from `weights` are dropped (weight 0). Rates are a
    * pure arithmetic function of the totals, so any engine reproduces
    * the exact keep set (q100's oracle recomputes them in SQL).
    */
  def mixToTarget(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      tokenCountCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val totals = df.filter(col(stratumCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(stratumCol)).agg(sum(col(tokenCountCol)).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => totals.getOrElse(s, 0L) > 0L }
    require(present.nonEmpty, "no stratum with data")
    val scale = present.map { case (s, w) => totals(s) / w }.min
    val rates = present.map { case (s, w) => s -> scale * w / totals(s) }
    val rate = rates.foldLeft(lit(-1.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(unitHash(col(idCol)) < rate)
  }

  /** Sliding-window token chunking — the RAG/embedding prep shape: each
    * document's token stream splits into windows of `size` tokens
    * advancing by `size - overlap`, so consecutive chunks share
    * `overlap` tokens. Emits one row per chunk with the re-joined text
    * and its token count (the last chunk may run short).
    *
    * Pure per-row explode + array slicing: no shuffle, no state —
    * embarrassingly parallel at any corpus size. The exploded row
    * carries the doc's token array into the slice, which is fine at
    * chunk granularity (a handful of chunks per doc), unlike q94's
    * per-CHARACTER positions where that copy dominated.
    */
  def slidingChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      size: Int,
      overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need size > overlap >= 0")
    val step = size - overlap
    val toks = split(col(textCol), " ")
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0),
          greatest(org.apache.spark.sql.functions.size(col("__toks")) - 1, lit(0)),
          lit(step))).as("__start"))
      .select(col(idCol),
        (col("__start") / step).cast("int").as("chunk_idx"),
        least(lit(size),
          org.apache.spark.sql.functions.size(col("__toks")) - col("__start"))
          .as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(size)), " ")
          .as("chunk_text"))
  }

  /** Water-filling budget allocation across groups (the UniMax idea,
    * Chung et al. 2023): spread `budget` units so every group below the
    * water level is fully used and the rest split the remainder evenly.
    * Closed form over groups sorted by (size, key) ascending:
    * k = max{i : sᵢ·(n−i+1) ≤ B − S_{i−1}}, level t = (B−S_k)/(n−k),
    * allocᵢ = sᵢ for i ≤ k else t (and B/n for every group when even the
    * smallest exceeds its even share).
    *
    * Input: one row per group with `keyCol` (string) and `sizeCol`
    * (long). Output: keyCol, sizeCol, alloc (double, rounded 4 dp),
    * fully_used. The windows run over the GROUP-COUNT-sized frame (this
    * operator's input is an aggregate, never the corpus), and the three
    * scalars (n, k, S_k) broadcast back.
    */
  def waterFillBudget(
      groups: DataFrame,
      keyCol: String,
      sizeCol: String,
      budget: Long): DataFrame = {
    val st = groups.select(col(keyCol), col(sizeCol).cast("long").as(sizeCol))
    val nct = st.agg(count(lit(1)).as("n"))
    // Rank + prefix sum over the group-count-sized frame via the
    // triangular self-join (ScalableWindow.boundedRankCum) — same values
    // as the former unpartitioned window, no single-partition stage.
    val o = ScalableWindow.boundedRankCum(st,
        Seq((sizeCol, true), (keyCol, true)), "i", Seq((sizeCol, "s_i")))
      .crossJoin(broadcast(nct))
    val full = col(sizeCol) * (col("n") - col("i") + 1) <=
      lit(budget) - (col("s_i") - col(sizeCol))
    val p = o
      .withColumn("pi", when(full, col("i")))
      .withColumn("psi", when(full, col("s_i")))
    val t = p.agg(max(col("pi")).as("k"), max(col("psi")).as("sk"))
    p.crossJoin(broadcast(t))
      .select(col(keyCol), col(sizeCol),
        round(
          when(col("k").isNotNull && col("i") <= col("k"),
            col(sizeCol).cast("double"))
            .when(col("k").isNull, lit(budget.toDouble) / col("n"))
            .otherwise((lit(budget) - col("sk")) /
              (col("n") - col("k")).cast("double")), 4).as("alloc"),
        (col("k").isNotNull && col("i") <= col("k")).as("fully_used"))
  }
}
