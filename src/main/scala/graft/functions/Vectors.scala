package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (`array<float>` / `array<double>`).
  *
  * All built on `zip_with` + `aggregate` higher-order functions: a strict
  * left-to-right fold, so results are bit-deterministic for a given input
  * order — required for cross-engine verification and reproducible ANN
  * results. Codegen'd, no UDFs.
  */
object Vectors {

  /** Cast an array<float> to array<double> (do all math in double). */
  def toDoubleVec(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product of two double vectors. Routed through the codegen'd
    * [[graft.plans.DotProduct]] Catalyst expression (tight Java loop in
    * whole-stage codegen); [[dotHof]] is the pure-functions fallback with
    * bit-identical results (same sequential fold).
    */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotNative(a, b)

  /** Dot product via higher-order functions only (interpreted eval — use
    * [[dot]] on hot paths).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0 || nb === 0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Cosine against a constant query vector (broadcast as a literal —
    * no join, evaluated inside whole-stage codegen at scan time).
    */
  def cosineToConst(v: Column, q: Seq[Double]): Column =
    cosine(toDoubleVec(v), array(q.map(lit): _*))

  /** Scalar mirror of [[cosineToConst]] for driver/state-side code (the
    * streaming retrieval monitor): the SAME left-to-right fold order and
    * the same d / (√na · √nb) spelling, so the double agrees bit-for-bit
    * with the codegen'd column — StreamingSpec pins stream == batch on
    * exactly this equality.
    */
  def cosineScalar(a: Seq[Double], b: Seq[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val sa = math.sqrt(na); val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else d / (sa * sb)
  }

  /** Symmetric int8 scalar-quantization scale: max|x| / 127. */
  def int8Scale(dv: Column): Column =
    array_max(transform(dv, x => abs(x))) / lit(127.0)

  /** Quantize a double vector to int8 codes (carried as longs): each
    * element is round(x / scale), all-zero when the scale is 0 (zero
    * vector). `round` is HALF_UP away-from-zero on the same doubles in
    * both Spark and DuckDB, so codes are cross-engine exact; by
    * construction codes lie in [-127, 127], so no clamp is needed.
    */
  def int8Codes(dv: Column, scale: Column): Column =
    when(scale > 0, transform(dv, x => round(x / scale, 0).cast("long")))
      .otherwise(transform(dv, _ => lit(0L)))

  /** Exact integer dot product of two code vectors (order-independent —
    * pure integer math, no float folding concerns).
    */
  def codeDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Random-hyperplane LSH bucket for cosine similarity: the sign-bit
    * pattern of the vector against `planes` fixed hyperplanes, packed into
    * an int. Vectors in the same bucket are ANN candidates; probing
    * neighboring buckets (Hamming distance 1) raises recall. `planes` are
    * supplied by the caller (deterministic seeds) so buckets are stable
    * across runs and engines.
    */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(toDoubleVec(v), array(p.map(lit): _*)) >= 0, lit(1 << i))
        .otherwise(lit(0))
    }.reduce(_ + _)
}
