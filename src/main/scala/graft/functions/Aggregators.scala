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
