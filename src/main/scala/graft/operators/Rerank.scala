package graft.operators

import org.apache.spark.sql.Dataset

/** Two-stage retrieval reranking: a cheap stage-1 retriever (brute-force
  * / LSH / IVF / int8 top-N) produces a small candidate set, and an
  * expensive cross-encoder re-scores each (query, candidate) pair.
  *
  * The plumbing is the real contract here — it is exactly the shape a
  * model-inference reranker needs at 100 TB:
  *   - `mapPartitions`, so the "model" is initialized ONCE per partition
  *     (loading an actual cross-encoder per row would dominate runtime);
  *   - rows scored in fixed-size batches (`grouped(batchSize)`), the
  *     shape batched inference wants;
  *   - the candidate set is top-N bounded, so the expensive stage touches
  *     N rows per query regardless of corpus size.
  *
  * The scorer itself is a declared STUB standing in for model inference
  * (no ML runtime in this environment), but a deterministic one: it
  * blends the stage-1 score with an md5-derived pair affinity
  * (the [[Sampling.unitHash]] construction), so the whole pipeline is
  * exactly reproducible cross-engine and q88's DuckDB oracle checks the
  * reranked scores themselves.
  */
object Rerank {

  case class Candidate(id: Long, stage1_score: Double)
  case class Reranked(id: Long, stage1_score: Double, rerank_score: Double)

  /** Stub cross-encoder blend: 0.9·stage1 + 0.1·affinity(query, doc),
    * affinity = first 8 md5 hex digits of "query|doc" as a unit-interval
    * double (identical to the SQL `md5`/`conv` form).
    */
  def rerank(
      candidates: Dataset[Candidate],
      queryId: Long,
      batchSize: Int = 32): Dataset[Reranked] = {
    import candidates.sparkSession.implicits._
    candidates.mapPartitions { it =>
      // Partition-local "model" handle — initialized once, reused for
      // every batch in this partition.
      val md = java.security.MessageDigest.getInstance("MD5")
      def affinity(q: Long, d: Long): Double = {
        val hex = md.digest(s"$q|$d".getBytes("UTF-8"))
          .take(4).map(b => f"${b & 0xff}%02x").mkString
        java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
      }
      it.grouped(batchSize).flatMap { batch =>
        batch.map(c => Reranked(c.id, c.stage1_score,
          0.9 * c.stage1_score + 0.1 * affinity(queryId, c.id)))
      }
    }
  }
}
