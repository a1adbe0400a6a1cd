package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (the UDAF tier the reference never uses —
  * SURVEY §2.9 notes "no UDAF"; provided as the engine's extension point
  * for custom aggregation state beyond built-ins).
  */
object Aggregators {

  /** Exact weighted mean with a (sum, weight) buffer. */
  class WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0) 0.0 else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** KMV (k-minimum-values) distinct-count sketch over unit-interval
    * hashes: keep the k smallest DISTINCT hash values; estimate is
    * `(k-1)/h_k` when the buffer fills, the exact distinct count when it
    * doesn't. O(k) state per group — the mergeable-sketch answer to
    * COUNT(DISTINCT) at 100 TB. Unlike HLL (engine-specific registers),
    * the KMV estimate is a pure function of the input hash set, so an
    * oracle on another engine reproduces it EXACTLY (q75).
    */
  class KmvDistinct(k: Int) extends Aggregator[Double, Seq[Double], Double] {
    override def zero: Seq[Double] = Vector.empty
    override def reduce(b: Seq[Double], a: Double): Seq[Double] =
      // Full buffer + a >= max: a can never enter the k-minimum set —
      // skip the O(k log k) contains+sort (the common case on big groups).
      if (b.size == k && a >= b.last) b
      else if (b.contains(a)) b
      else (b :+ a).sorted.take(k)
    override def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] =
      (x ++ y).distinct.sorted.take(k)
    override def finish(b: Seq[Double]): Double =
      if (b.size < k) b.size.toDouble else (k - 1).toDouble / b.last
    override def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Distributed Gram matrix Xᵀ X over a vector column: the buffer is the
    * d(d+1)/2 upper-triangular sums, accumulated row-major
    * (i outer from 0, j inner from i) — linear index
    * `k = i·(2d−i+1)/2 + (j−i)`. This is the scale-correct shape for
    * covariance/PCA precursors at 100 TB: each input partition folds its
    * rows into ONE fixed d²/2-double buffer (map-side combine), so shuffle
    * volume is partitions × d(d+1)/2 doubles — never corpus-sized, vs the
    * explode+self-join formulation whose shuffle is corpus × d². Mirrors
    * MLlib's `RowMatrix.computeGramianMatrix` contract (driver state is
    * d×d by definition) re-expressed as a typed `Aggregator` usable from
    * the DataFrame API via `udaf`.
    */
  class GramMatrix(d: Int) extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    private val len = d * (d + 1) / 2
    override def zero: Array[Double] = new Array[Double](len)
    override def reduce(b: Array[Double], x: Seq[Double]): Array[Double] = {
      val v = x.toArray
      var k = 0
      var i = 0
      while (i < d) {
        val xi = v(i)
        var j = i
        while (j < d) { b(k) += xi * v(j); k += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var k = 0
      while (k < len) { x(k) += y(k); k += 1 }
      x
    }
    override def finish(b: Array[Double]): Seq[Double] = b.toSeq
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Bounded top-k smallest values per group (k-element buffer — the
    * aggregation analog of TakeOrderedAndProject; state is O(k) however
    * many rows a group has).
    */
  class TopKMin(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    override def zero: Seq[Double] = Vector.empty
    override def reduce(b: Seq[Double], a: Double): Seq[Double] =
      (b :+ a).sorted.take(k)
    override def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] =
      (x ++ y).sorted.take(k)
    override def finish(b: Seq[Double]): Seq[Double] = b
    override def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
