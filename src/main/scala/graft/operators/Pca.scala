package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.Aggregators

/** Principal-component extraction over an embedding column, split the way
  * Spark MLlib splits it (`RowMatrix.computePrincipalComponents`): the
  * O(n·d²) Gram accumulation is DISTRIBUTED (one map-combined
  * [[Aggregators.GramMatrix]] pass — shuffle volume is partitions×d²/2
  * doubles, never corpus-sized), and the O(d³)-ish eigensolve runs on the
  * DRIVER, where the d×d matrix lives by definition. Driver state is d²
  * doubles — the same bounded-collect contract as SemDeDup's k×dim
  * centroids. The eigensolve here is fixed-iteration power iteration
  * from a deterministic start (uniform 1/√d), so the result is a pure
  * function of the data and both an SQL oracle and a re-run reproduce it
  * bit-for-bit — no eigen-library dependency, no convergence
  * nondeterminism.
  */
object Pca {

  /** Upper-triangular Gram entries (i ≤ j, 0-based) of `vecCol`:
    * one aggregated row exploded to (i, j, gram) — 2080 rows at d=64.
    */
  def gramUpper(df: DataFrame, vecCol: String, d: Int): DataFrame = {
    val gram = udaf(new Aggregators.GramMatrix(d), ExpressionEncoder[Seq[Double]]())
    // Linear index k = i(2d−i+1)/2 + (j−i) — must match GramMatrix's
    // row-major accumulation order exactly (integer arithmetic, no window).
    df.select(col(vecCol).cast("array<double>").as("v"))
      .agg(gram(col("v")).as("g"))
      .select(posexplode(col("g")).as(Seq("k", "gram")))
      .join(
        broadcast(indexMap(df.sparkSession, d)),
        "k")
      .select(col("i"), col("j"), col("gram"))
  }

  /** (k, i, j) upper-triangular index map — d(d+1)/2 rows, broadcast. */
  private def indexMap(s: SparkSession, d: Int): DataFrame = {
    import s.implicits._
    val rows = for { i <- 0 until d; j <- i until d }
      yield (i.toLong * (2 * d - i + 1) / 2 + (j - i), i.toLong, j.toLong)
    rows.toDF("k", "i", "j")
  }

  /** Top eigenvector of the Gram matrix by `iters` rounds of power
    * iteration from x₀ = 1/√d. Returns (component 0-based, loading,
    * eigenvalue estimate xᵀGx of the final iterate). The d(d+1)/2 Gram
    * values are collected to the driver (bounded, documented above); the
    * corpus itself is touched exactly once, inside [[gramUpper]].
    */
  def topComponent(df: DataFrame, vecCol: String, d: Int, iters: Int): DataFrame = {
    val s = df.sparkSession
    val g = Array.ofDim[Double](d, d)
    gramUpper(df, vecCol, d).collect().foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      g(i)(j) = v
      g(j)(i) = v
    }
    var x = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to iters) {
      val y = Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += g(i)(j) * x(j); j += 1 }
        acc
      }
      val n = math.sqrt(y.map(v => v * v).sum)
      x = y.map(_ / n)
    }
    val eig = {
      val gx = Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += g(i)(j) * x(j); j += 1 }
        acc
      }
      x.zip(gx).map { case (a, b) => a * b }.sum
    }
    import s.implicits._
    x.zipWithIndex.map { case (v, i) => (i.toLong, v, eig) }.toSeq
      .toDF("component", "loading", "eigenvalue")
  }
}
