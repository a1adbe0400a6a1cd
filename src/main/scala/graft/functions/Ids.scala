package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.ScalableWindow

/** Surrogate-id assignment.
  *
  * The reference uses `monotonically_increasing_id()`
  * (`etl/jobs/util/id_assigner.py:5-6`) and then works around its
  * re-evaluation hazard with a write-and-reread barrier
  * (`etl/jobs/transformation/links_generation/molecular_characterization_links_builder.py:21-25`).
  * We instead derive ids deterministically from natural keys — stable across
  * re-evaluation, stages, and cluster re-runs, and join-safe without a
  * materialisation barrier. This matters at 100 TB: no checkpoint round-trip.
  */
object Ids {

  /** Deterministic 64-bit id from the natural key columns (xxhash64).
    * Collision-free in practice for entity cardinalities here (<2^32 rows).
    */
  def hashId(naturalKey: Column*): Column = xxhash64(naturalKey: _*)

  /** Contiguous dense id 1..N over the DISTINCT key set, ordered by
    * `key` ascending — only when contiguity genuinely matters (DB
    * sequences). Implemented as the triangular self-join
    * ([[ScalableWindow.boundedRankCum]]), NOT a global window: no
    * single-partition stage, at the cost of |keys|² join rows — callers
    * must be dimension-sized by construction (both engine call sites are
    * ≤ |order-class| ≈ 15 and |p_brand| = 25). `df` must already be
    * distinct on `key` (ties would collapse ranks).
    */
  def denseId(df: DataFrame, key: String, out: String): DataFrame =
    ScalableWindow.boundedRankCum(df, Seq(key -> true), out)
      .withColumn(out, col(out).cast("int"))

  /** Add a deterministic id column named `idCol` from natural keys. */
  def withHashId(df: DataFrame, idCol: String, naturalKey: String*): DataFrame =
    df.withColumn(idCol, hashId(naturalKey.map(col): _*))
}
