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
  *   - that 1-row filter is BROADCAST and applied to the fact scan as a
  *     codegen'd predicate, so at 100 TB the fact side drops non-matching
  *     rows BEFORE its shuffle — the expensive exchange carries only rows
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
    val bloom = dim.agg(
      BloomExpressions.bloomBuild(col(dimKey), numBits, numHashes).as("__bloom"))
    val pruned = fact
      .join(broadcast(bloom))
      .where(BloomExpressions.mightContain(col(factKey), col("__bloom")))
      .drop("__bloom")
    if (factKey == dimKey) pruned.join(dim, Seq(factKey))
    else pruned.join(dim, col(factKey) === col(dimKey))
  }
}
