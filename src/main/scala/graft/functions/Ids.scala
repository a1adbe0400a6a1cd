package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** Contiguous dense id 1..N ordered by the natural key — only when
    * contiguity genuinely matters (DB sequences). Costs one shuffle +
    * a single-partition window, so reserve for small dims.
    */
  def denseId(orderBy: Column*): Column =
    dense_rank().over(Window.orderBy(orderBy: _*))

  /** Add a deterministic id column named `idCol` from natural keys. */
  def withHashId(df: DataFrame, idCol: String, naturalKey: String*): DataFrame =
    df.withColumn(idCol, hashId(naturalKey.map(col): _*))
}
