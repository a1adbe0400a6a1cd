package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.BloomExpressions

/** Bloom-pruned join: the runtime-filter pattern as an explicit operator.
  *
  * Plan shape (and why it scales):
  *
  *   - dim side: one aggregation builds a bloom filter of the join keys
  *     (distributed; per-partition bitsets OR-merged — the keys are never
  *     centralized, and the result is ONE row of `numBits/8` bytes).
  *   - that single filter row is materialized as a BINARY LITERAL — the
  *     same move as the scalar subquery in Spark's own runtime filters.
  *     The driver sees numBits/8 bytes once, never the keys; the literal
  *     is a codegen reference object, so the probe never copies the
  *     filter. (Joining the filter in as a 1-row broadcast COLUMN reads
  *     the full byte array out of the joined row per fact row — measured
  *     ~3 s of pure memcpy on a 600k-row probe side at 32 KB.)
  *   - the probe predicate runs inside the fact scan's whole-stage
  *     codegen, so at 100 TB the fact side drops non-matching rows
  *     BEFORE its shuffle — the expensive exchange carries only rows
  *     whose keys plausibly exist on the dim side.
  *   - the real join then removes bloom false positives, so the result is
  *     exactly the plain join (which is what the oracle checks).
  *
  * Use when the dim side is too big to broadcast as a hash-join build
  * (where Spark's broadcast join would prune anyway) but its KEY SET
  * still fits a few MB of bloom bits — the classic selective-dim /
  * huge-fact shuffle join. This is what Spark's AQE runtime filter
  * injects implicitly; having it as an operator makes the pruning
  * explicit, tunable (bits/hashes), and usable on plans AQE won't touch.
  */
object BloomJoin {

  /** Inner join `fact ⋈ dim` on `factKey = dimKey`, with the fact side
    * pre-pruned by a bloom filter of `dim`'s keys. Exact same rows as the
    * unpruned join. Keys are cast to LONG (the common FK case).
    */
  def prunedJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      numBits: Int = 1 << 20,
      numHashes: Int = 5
  ): DataFrame = {
    val bloomBytes = dim.agg(
      BloomExpressions.bloomBuild(col(dimKey), numBits, numHashes).as("__bloom"))
      .head().getAs[Array[Byte]]("__bloom")
    val pruned = fact
      .where(BloomExpressions.mightContain(col(factKey), lit(bloomBytes)))
    if (factKey == dimKey) pruned.join(dim, Seq(factKey))
    else pruned.join(dim, col(factKey) === col(dimKey))
  }
}
