package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DDSketch-style relative-error quantiles (Masson et al., VLDB 2019)
  * expressed as a RELATIONAL sketch: bucket `idx = ceil(log_γ v)` with
  * γ = (1+α)/(1-α) guarantees every value in bucket `idx` is within
  * relative error α of the bucket midpoint estimate 2γ^idx/(γ+1).
  *
  * Why this sketch and not a t-digest: t-digest merging is
  * ORDER-DEPENDENT (centroids depend on insertion/merge order), so a
  * streamed digest can never be spec'd exactly equal to its batch
  * counterpart. DDSketch buckets are a pure per-value function; the
  * sketch of a union is the SUM of bucket counts — commutative,
  * associative, deterministic — which is what lets the streaming face
  * ([[graft.streaming.StreamingQuantiles]]) pin stream == batch ==
  * oracle EXACTLY, the engine's standard for every stateful face.
  *
  * Scale shape: the bucket id is a codegen'd projection, the sketch is
  * a (key × ~600 buckets) table built by one map-combinable count, and
  * quantile extraction walks the bucket table (key-partitioned window
  * over ≤ buckets rows), never the corpus. Cross-engine determinism:
  * the log ratio is rounded to 6 dp before ceil (the q87/q123/q210 ln
  * rule) so bucket boundaries agree with the DuckDB oracle bit-for-bit;
  * rank thresholds are exact integer comparisons (2·cum ≥ n, 10·cum ≥
  * 9·n — the q209 weighted-median arithmetic).
  */
object DdSketch {

  /** α = 1% relative-error target → γ = (1+α)/(1-α). */
  val Alpha = 0.01
  val Gamma: Double = (1 + Alpha) / (1 - Alpha)

  /** Bucket index for a positive value column (codegen'd). */
  def bucketIdx(v: Column): Column =
    ceil(round(log(v.cast("double")) / log(lit(Gamma)), 6)).cast("long")

  /** Scala mirror of [[bucketIdx]] for per-row streaming state — same
    * 6-dp HALF_UP rounding as Spark's `round`, same ceil.
    */
  def bucketIdxScala(v: Double): Long = {
    val r = java.math.BigDecimal.valueOf(math.log(v) / math.log(Gamma))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    math.ceil(r).toLong
  }

  /** Bucket-midpoint value estimate for an index column, rounded to
    * 4 dp (the cross-engine pow tolerance).
    */
  def estimate(idx: Column): Column =
    round(lit(2.0) * pow(lit(Gamma), idx) / lit(Gamma + 1.0), 4)

  /** Scala mirror of [[estimate]] — BigDecimal HALF_UP like Spark's
    * `round`.
    */
  def estimateScala(idx: Long): Double =
    java.math.BigDecimal.valueOf(2.0 * math.pow(Gamma, idx.toDouble) / (Gamma + 1.0))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The sketch itself: (key, idx, c) bucket counts — one
    * map-combinable aggregation over a codegen'd projection.
    */
  def buckets(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.select(col(keyCol), bucketIdx(col(valueCol)).as("idx"))
      .groupBy(col(keyCol), col("idx")).agg(count(lit(1)).as("c"))

  /** Exact-integer rank walk over a bucket table: the smallest bucket
    * index whose cumulative count reaches `pNum/pDen` of the total.
    * Window is key-partitioned over ≤ bucket-count rows.
    */
  def quantileIdx(bucketDf: DataFrame, keyCol: String,
      pNum: Int, pDen: Int, out: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tw = Window.partitionBy(col(keyCol))
    bucketDf
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(tw))
      .filter(col("cum") * pDen >= col("n") * pNum)
      .groupBy(col(keyCol)).agg(min(col("idx")).as(out))
  }

  /** Scala mirror of the full state→quantile path for the streaming
    * face: same integer thresholds, same midpoint estimate.
    */
  def quantileScala(counts: Map[Long, Long], pNum: Int, pDen: Int): Double = {
    val n = counts.values.sum
    var cum = 0L
    for ((idx, c) <- counts.toSeq.sortBy(_._1)) {
      cum += c
      if (cum * pDen >= n * pNum) return estimateScala(idx)
    }
    Double.NaN // unreachable for non-empty state
  }
}
