package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-training step upstream of q119's encode and q128's coverage
  * check. Classic BPE: start from characters (plus an end-of-word
  * marker), repeatedly find the most frequent adjacent symbol pair across
  * the word-frequency table and merge it everywhere.
  *
  * Scale design (100 TB corpus): the corpus is scanned ONCE to build the
  * word-frequency table — a map-combinable groupBy whose result is
  * VOCABULARY-sized (distinct words), which is what every iteration then
  * works on. Per merge round: pair extraction is a higher-order-function
  * projection (no explode of the corpus — only of the word table's
  * symbol arrays), the weighted pair count is a map-combinable partial
  * agg, the argmax is `orderBy(...).limit(1)` (TakeOrderedAndProject —
  * one pair reaches the driver per round), and the merge itself is a
  * codegen'd array fold applied in place. Driver state after k rounds is
  * k pairs — never the vocabulary, never the corpus. Determinism: ties
  * on the pair count break lexicographically, so the merge list is a
  * pure function of the corpus.
  */
object Bpe {

  /** Word-frequency table with initial symbol arrays: lowercase
    * whitespace tokens, per-character symbols plus a `</w>` end marker.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        concat(split(col("word"), ""), array(lit("</w>"))).as("symbols"))

  /** Frequency-weighted adjacent-pair counts over a word table — the
    * per-round statistic BPE's argmax reads. One explode of the
    * VOCABULARY-sized symbol arrays (never the corpus) feeding a
    * map-combinable partial agg; output is alphabet²-bounded.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(col("freq"), explode(adjacentPairs(col("symbols"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("pair_count"))

  /** Adjacent symbol pairs of `symbols` as (a, b) structs. */
  private def adjacentPairs(symbols: Column): Column =
    transform(slice(symbols, lit(1), size(symbols) - 1),
      (s, i) => struct(s.as("a"), element_at(symbols, i + 2).as("b")))

  /** Left-to-right non-overlapping merge of the adjacent pair (a, b)
    * into the single symbol a+b — the standard BPE application order,
    * expressed as a codegen'd array fold (no UDF).
    */
  private def mergePair(symbols: Column, a: String, b: String): Column =
    aggregate(symbols, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Learn `k` merges from a word table. Returns the ordered merge list;
    * stops early when no adjacent pair remains. k driver round-trips of
    * ONE (a, b, count) row each — the same bounded-iteration contract as
    * SemDeDup's Lloyd loop and the tree BFS.
    */
  def learnMerges(words: DataFrame, k: Int): Seq[(String, String)] = {
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var cur = words.select(col("freq"), col("symbols"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cur.count() // materialize before the loop re-references it
    try {
      var done = false
      for (_ <- 1 to k if !done) {
        val top = pairCounts(cur)
          .orderBy(col("pair_count").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val (a, b) = (top.head.getString(0), top.head.getString(1))
          merges += ((a, b))
          val next = cur
            .select(col("freq"), mergePair(col("symbols"), a, b).as("symbols"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          cur.unpersist(blocking = false)
          cur = next
        }
      }
      merges.toList
    } finally cur.unpersist(blocking = false)
  }

  /** Apply a learned merge list to a word table (training-time replay or
    * encoding a new shard): the same codegen'd fold, once per merge.
    */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(words) { case (df, (a, b)) =>
      df.withColumn("symbols", mergePair(col("symbols"), a, b))
    }
}
