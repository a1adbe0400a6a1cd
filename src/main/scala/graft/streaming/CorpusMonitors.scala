package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Streaming faces of the corpus-quality monitors (q125 perplexity filter,
  * q128 vocab coverage): documents STREAM in (a crawl frontier, an ingest
  * queue), while the language model / tokenizer vocabulary is STATIC state
  * trained on a frozen reference corpus and refreshed out-of-band — the
  * shape a continuous curation pipeline runs, where re-deriving the LM per
  * micro-batch would be both wasteful and statistically wrong (the filter
  * must be stable while a crawl is graded).
  *
  * Scale design, mirroring the batch queries exactly:
  *   - the static side is vocabulary-sized (terms × 1 double), so the
  *     stream-static join broadcasts while the vocab fits and degrades to
  *     a shuffle join only when it outgrows the executors;
  *   - per-doc scoring state is the doc's own token list (bounded by doc
  *     length), per-source coverage state is two longs — no unbounded
  *     state, no token stream ever windowed;
  *   - both transforms are identical code for batch and streaming frames,
  *     so the stream==batch specs are exact-equality checks, not
  *     approximations.
  */
object CorpusMonitors {

  /** Static unigram LM from a frozen reference corpus: one row per term
    * with `lp = -ln p(term)` on a 6-dp grid (q125's construction), plus
    * the additive-smoothed default for out-of-vocabulary terms — the
    * streamed corpus is NOT the training corpus, so OOV must score, not
    * crash. Returns (lm, oovLp): persist the lm for reuse across
    * micro-batches.
    */
  def unigramLm(reference: DataFrame, textCol: String): (DataFrame, Double) = {
    val terms = reference.select(explode(Text.tokens(col(textCol))).as("term"))
    val lm = terms.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val Array(total, vocab) = lm.agg(sum(col("cnt")), count(lit(1)))
      .collect().head.toSeq.map(_.toString.toLong).toArray
    val lp = lm.select(col("term"),
      round(-log(col("cnt").cast("double") / total.toDouble), 6).as("lp"))
    // Unseen term ≈ count 1 under add-one smoothing of the same LM.
    val oovLp = math.rint(-math.log(1.0 / (total.toDouble + vocab)) * 1e6) / 1e6
    (lp, oovLp)
  }

  /** Per-doc perplexity scoring against a static LM — works identically on
    * a batch or streaming `docs` frame (streaming: update/complete output
    * mode; all of a doc's tokens explode inside its own micro-batch).
    * Determinism: per-position lp values on a 6-dp grid, summed in
    * position order via the sorted-struct fold (q123/q125's idiom) — the
    * result is bit-identical however micro-batches slice the stream.
    */
  def perplexityScores(docs: DataFrame, lm: DataFrame, oovLp: Double,
      idCol: String, textCol: String, threshold: Double = 3.45): DataFrame = {
    val pos = docs
      .select(col(idCol).as("doc_id"), posexplode(Text.tokens(col(textCol))))
      .select(col("doc_id"), col("pos"), col("col").as("term"))
    pos.join(lm, Seq("term"), "left") // stream-static equi-join
      .select(col("doc_id"), col("pos"),
        coalesce(col("lp"), lit(oovLp)).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        aggregate(array_sort(collect_list(struct(col("pos"), col("lp")))),
          lit(0.0), (a, x) => a + x.getField("lp")).as("nll"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("nll") / col("n_tokens"), 4).as("avg_neg_logp"),
        (col("nll") / col("n_tokens") <= lit(threshold)).as("keep"))
  }

  /** Static DSIR model (Xie et al. 2023) from a frozen reference corpus:
    * per-term log-likelihood ratio `lt = ln(p_target(t) / p_raw(t))`,
    * add-one smoothed over the reference vocabulary — q133's construction
    * with the totals collected once (3 longs) so the model can be pinned
    * and reused across micro-batches. Returns (ltTable, oovLt) where
    * `oovLt` is the ratio an unseen term scores (count 0 on both sides).
    */
  def dsirModel(reference: DataFrame, textCol: String,
      isTarget: Column): (DataFrame, Double) = {
    val pos = reference
      .select(isTarget.as("t"), explode(Text.tokens(col(textCol))).as("term"))
    val Seq(ttot, rtot, v) = pos
      .agg(sum(col("t").cast("long")), sum((!col("t")).cast("long")),
        countDistinct(col("term")))
      .collect().head.toSeq.map(_.toString.toLong)
    val tgt = pos.filter(col("t")).groupBy(col("term")).agg(count(lit(1)).as("tcnt"))
    val raw = pos.filter(!col("t")).groupBy(col("term")).agg(count(lit(1)).as("rcnt"))
    val lt = pos.select(col("term")).distinct()
      .join(tgt, Seq("term"), "left").join(raw, Seq("term"), "left")
      .select(col("term"), round(log(
        ((coalesce(col("tcnt"), lit(0L)) + 1).cast("double") / lit(ttot + v)) /
        ((coalesce(col("rcnt"), lit(0L)) + 1).cast("double") / lit(rtot + v))), 6)
        .as("lt"))
    val oovLt = math.rint(math.log((1.0 / (ttot + v)) / (1.0 / (rtot + v))) * 1e6) / 1e6
    (lt, oovLt)
  }

  /** Per-doc DSIR score against a static model — identical code for batch
    * and streaming frames (stream-static equi-join by term, per-doc state
    * = the doc's own token list, position-ordered fold). On the
    * reference corpus itself this reproduces q133's oracle-checked output
    * bit-for-bit (the spec asserts it).
    */
  def dsirScores(docs: DataFrame, lt: DataFrame, oovLt: Double,
      idCol: String, textCol: String): DataFrame = {
    val pos = docs
      .select(col(idCol).as("doc_id"), posexplode(Text.tokens(col(textCol))))
      .select(col("doc_id"), col("pos"), col("col").as("term"))
    pos.join(lt, Seq("term"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("lt"), lit(oovLt)).as("lt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        aggregate(array_sort(collect_list(struct(col("pos"), col("lt")))),
          lit(0.0), (a, x) => a + x.getField("lt")).as("lr"))
      .select(col("doc_id"), col("n_tokens"),
        // 6 dp + signed-zero canonicalization — q133's sf1-sweep fixes,
        // mirrored so the stream == batch pin keeps holding
        (round(col("lr"), 6) + lit(0.0)).as("log_ratio"),
        (col("lr") > 0).as("keep"))
  }

  /** Static tokenizer vocabulary: top-`k` terms of the reference corpus by
    * total count (TakeOrderedAndProject — the q119 lesson: never a global
    * sort or single-partition window for a top-k).
    */
  def topKVocab(reference: DataFrame, textCol: String, k: Int): DataFrame =
    reference.select(explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tc"))
      .orderBy(col("tc").desc, col("term")).limit(k)
      .select(col("term"))

  /** Running per-source coverage of a static vocabulary — q128's output
    * contract (n_tokens, covered, coverage, oov_rate per source), computed
    * incrementally: streaming aggregation state is two longs per source,
    * and each micro-batch's token counts fold in by addition, so the
    * final state equals the batch aggregate exactly.
    */
  def vocabCoverage(docs: DataFrame, vocab: DataFrame,
      sourceCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(sourceCol).as("source"),
      explode(Text.tokens(col(textCol))).as("term"))
    toks
      .join(broadcast(vocab.withColumn("in_vocab", lit(1))), Seq("term"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab") === 1, 1L).otherwise(0L)).as("covered"))
      .select(col("source"), col("n_tokens"), col("covered"),
        round(col("covered").cast("double") / col("n_tokens"), 4).as("coverage"),
        round(lit(1.0) - col("covered").cast("double") / col("n_tokens"), 4)
          .as("oov_rate"))
  }
}
