package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming blocked-candidate monitor — q355's continuous face (30th
  * streaming face): fixed-width codes arrive per deterministic block and
  * the operator maintains the capped pair stream LIVE, under exactly the
  * [[graft.operators.Relational.keyedPairs]] maxWidth discipline — a
  * fuzzy-linkage ingest watches candidate-pair mass (and the Hamming
  * histogram over it) grow as records land, without ever re-running the
  * batch self-join.
  *
  * The cap is the hard part: batch `keyedPairs(maxWidth)` DROPS an
  * over-width block entirely (skip, never sample). A streaming operator
  * has already emitted the block's pairs by the time the width crosses
  * the cap, so the crossing emits one RETRACTION (delta −1) per
  * previously emitted pair and poisons the block: every (blk, hamming)
  * contribution of a poisoned block nets to exactly zero, and the
  * converged rollup equals the batch histogram bit-for-bit.
  *
  * Contract: NONE on arrival order — emissions are signed counts and
  * poisoning depends only on the block's total width, so any
  * interleaving converges to the same rollup (the commutative-counter
  * class; the spec feeds fully shuffled chunks). Within one trigger the
  * per-key iterator is processed in arrival order; the intermediate
  * deltas depend on that order, the net never does. State per block is
  * at most `maxWidth` codes while active and O(1) once poisoned —
  * bounded exactly like the batch operator's declared cap.
  *
  * Pair semantics mirror the batch join verbatim: value-UNORDERED pairs
  * via strict `<` on the code, so equal codes never pair (Hamming 0
  * cannot occur) while duplicate occurrences still pair with every
  * other distinct value, once per occurrence.
  */
object StreamingBlockedPairs extends Serializable {

  case class CodeEv(blk: String, code: String)
  case class PairDelta(blk: String, hamming: Int, delta: Long)

  /** Poisoned blocks keep no codes; `codes` is newest-first. */
  case class BlockState(poisoned: Boolean, codes: List[String])

  /** Aligned-position mismatch count — the Scala mirror of q355's
    * codegen'd zip_with/aggregate fold (exact integer char compares on
    * equal-width strings).
    */
  def hamming(a: String, b: String): Int = {
    var i = 0; var h = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a.charAt(i) != b.charAt(i)) h += 1; i += 1 }
    h + math.abs(a.length - b.length)
  }

  def deltas(evs: Dataset[CodeEv], maxWidth: Int): Dataset[PairDelta] = {
    import evs.sparkSession.implicits._

    def fn(blk: String, it: Iterator[CodeEv],
        state: GroupState[BlockState]): Iterator[PairDelta] = {
      var st = state.getOption.getOrElse(BlockState(poisoned = false, Nil))
      val out = scala.collection.mutable.ArrayBuffer.empty[PairDelta]
      it.foreach { e =>
        if (!st.poisoned) {
          if (st.codes.size + 1 > maxWidth) {
            // Width crossed the cap: batch semantics drop the WHOLE
            // block, so retract every pair emitted for it (one −1 per
            // i<j occurrence pair with distinct values — the exact
            // multiset the +1 path produced) and poison the block. The
            // crossing code itself emits nothing.
            val cs = st.codes.toArray
            var i = 0
            while (i < cs.length) {
              var j = i + 1
              while (j < cs.length) {
                val h = hamming(cs(i), cs(j))
                if (h > 0) out += PairDelta(blk, h, -1L)
                j += 1
              }
              i += 1
            }
            st = BlockState(poisoned = true, Nil)
          } else {
            st.codes.foreach { c0 =>
              val h = hamming(c0, e.code)
              if (h > 0) out += PairDelta(blk, h, 1L)
            }
            st = st.copy(codes = e.code :: st.codes)
          }
        }
      }
      state.update(st)
      out.iterator
    }

    evs.groupByKey(_.blk)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout())(fn)
  }

  /** Event feed from the batch customer table: the SAME block/code
    * derivation q355 uses (nation × first hex char block, 8-hex md5
    * code), so the pin can never drift from the declared query.
    */
  def fromCustomer(customer: DataFrame): Dataset[CodeEv] = {
    import customer.sparkSession.implicits._
    customer
      .select(col("c_nationkey"),
        substring(md5(concat(lit("ph_"), col("c_custkey").cast("string"))),
          1, 8).as("code"))
      .select(concat(col("c_nationkey").cast("string"), lit("_"),
        substring(col("code"), 1, 1)).as("blk"), col("code"))
      .as[CodeEv]
  }

  /** Converged-state rollup to q355's schema: signed deltas summed into
    * the Hamming histogram; poisoned blocks net to zero and vanish.
    */
  def rollup(deltas: DataFrame): DataFrame =
    deltas.groupBy(col("hamming").cast("long").as("hamming"))
      .agg(sum(col("delta")).as("n_pairs"))
      .filter(col("n_pairs") > 0)
}
