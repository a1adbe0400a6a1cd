package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * Scale design (100 TB): brute-force top-k against a constant query is a
  * single codegen'd scan + a k-row `TakeOrderedAndProject` (no shuffle of
  * the data, only of k-row partial results). The LSH variant buckets
  * vectors by random-hyperplane signs so bucket-local search touches a
  * small fraction of partitions; bucket ids are deterministic (fixed
  * hyperplanes) so the index can be precomputed, partitioned, and reused.
  */
object Similarity {

  /** Exact top-k by cosine similarity against a constant query vector.
    * `orderBy(...).limit(k)` compiles to TakeOrderedAndProject — each task
    * keeps a k-row heap; only k×partitions rows reach the driver side of
    * the exchange. Ties broken by id for determinism.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int
  ): DataFrame =
    embeddings
      .select(
        col(idCol),
        Vectors.cosineToConst(col(vecCol), query).as("cosine_sim")
      )
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplanes (xorshift-free, pure function
    * of (plane, dim) — identical across engines/runs).
    */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        // Deterministic value in [-1, 1): fractional part of sin-free LCG.
        val x = (p * 2654435761L + d * 40503L + 12345L) & 0xffffffffL
        (x.toDouble / 2147483648.0) - 1.0
      }
    }

  /** LSH index: each vector tagged with its hyperplane-sign bucket.
    * Persist/partition this by `bucket` for repeated queries.
    */
  def lshIndex(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int,
      dim: Int
  ): DataFrame =
    embeddings.withColumn(
      "bucket",
      Vectors.hyperplaneBucket(col(vecCol), hyperplanes(nPlanes, dim))
    )

  /** ANN top-k: search only the query's bucket (plus all Hamming-distance-1
    * probe buckets for recall). Scans ~ (nPlanes+1)/2^nPlanes of the data.
    */
  def lshTopK(
      index: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      nPlanes: Int,
      k: Int
  ): DataFrame = {
    val planes = hyperplanes(nPlanes, query.size)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d >= 0) 1 << i else 0
    }.sum
    val probes = qBucket +: (0 until nPlanes).map(b => qBucket ^ (1 << b))
    index
      .filter(col("bucket").isin(probes: _*))
      .select(
        col(idCol),
        Vectors.cosineToConst(col(vecCol), query).as("cosine_sim")
      )
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Int8 scalar-quantized ANN top-k: quantize every stored vector to
    * int8 codes + one per-vector scale (the index you'd PERSIST at
    * 100 TB — 4× smaller than fp32, so 4× less scan I/O), score with an
    * exact integer dot product de-scaled by the two scales, and take the
    * top k. The query's codes are built from literals, so Catalyst
    * constant-folds them to a single literal array at plan time; the
    * per-row work is one integer dot + two double multiplies, and the
    * top-k is a TakeOrderedAndProject (k-row heap per task, no data
    * shuffle). In a full pipeline the k finalists would be rescored
    * against the fp32 vectors; here the approximate score IS the output
    * contract so the oracle can check it exactly.
    */
  def int8TopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int
  ): DataFrame = {
    val qlit = array(query.map(lit): _*)
    val qScale = Vectors.int8Scale(qlit)
    val qCodes = Vectors.int8Codes(qlit, qScale)
    val dv = Vectors.toDoubleVec(col(vecCol))
    // inline(array(struct(...))) is a Generate barrier: the scale is
    // computed once per row, not re-inlined into every downstream
    // reference by project collapse.
    val quantized = embeddings
      .select(col(idCol),
        inline(array(struct(Vectors.int8Scale(dv).as("vscale"), dv.as("dv")))))
      .select(col(idCol), col("vscale"),
        Vectors.int8Codes(col("dv"), col("vscale")).as("codes"))
    quantized
      .select(
        col(idCol),
        Vectors.codeDot(col("codes"), qCodes).as("q_dot"),
        (col("vscale") * qScale *
          Vectors.codeDot(col("codes"), qCodes).cast("double")).as("__score"))
      .orderBy(col("__score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("q_dot"), round(col("__score"), 4).as("approx_dot"))
  }

  /** All pairs with cosine ≥ threshold within LSH buckets (embedding
    * near-duplicate detection). Bucket-local self-join — no cross product
    * across buckets.
    */
  def nearDuplicatePairs(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int,
      dim: Int,
      threshold: Double
  ): DataFrame = {
    // Precompute the double vector and its norm per ROW (linear work)
    // before the pairwise join, so each candidate pair costs one dot
    // product instead of three.
    val idx = lshIndex(embeddings, idCol, vecCol, nPlanes, dim)
      .select(col(idCol), Vectors.toDoubleVec(col(vecCol)).as("__v"), col("bucket"))
      .withColumn("__norm", Vectors.l2Norm(col("__v")))
    val a = idx.select(col(idCol).as("id_a"), col("__v").as("v_a"),
      col("__norm").as("n_a"), col("bucket"))
    val b = idx.select(col(idCol).as("id_b"), col("__v").as("v_b"),
      col("__norm").as("n_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn(
        "cosine_sim",
        when(col("n_a") === 0 || col("n_b") === 0, lit(0.0))
          .otherwise(Vectors.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      )
      .filter(col("cosine_sim") >= threshold)
      .select("id_a", "id_b", "cosine_sim")
  }
}
