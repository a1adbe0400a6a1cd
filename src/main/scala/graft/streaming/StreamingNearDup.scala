package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the continuous analog of the
  * batch banded-LSH path ([[graft.operators.Dedup.simhashClusters]] /
  * bucketed candidate pairs): documents stream in, each is simhashed
  * (codegen'd kernel) and exploded into 2 signature bands; per-band
  * buckets hold the recent signatures seen, and every arrival emits a
  * candidate pair for each stored signature within `maxHamming`.
  *
  * Pigeonhole recall: two 16-bit signatures within Hamming distance 1
  * agree exactly on at least one of the two 8-bit bands, so banding
  * loses no distance-1 pairs; larger distances degrade gracefully.
  *
  * State is BOUNDED: each bucket keeps the `maxPerBucket` most recent
  * (doc_id, sig) entries — at 100 TB/day the state size is
  * `2^8 bands × 2 × maxPerBucket` entries regardless of stream length,
  * the property that makes this runnable forever. (Production would add
  * an event-time timeout to expire cold buckets; the cap already bounds
  * memory without it.) A pair can surface from both bands —
  * candidate-level output is dedup-by-consumer, same contract as the
  * batch candidate generators.
  */
object StreamingNearDup {

  case class DocEvent(doc_id: Long, ts: Timestamp, text: String)

  case class BandedDoc(band: Int, value: Int, doc_id: Long, ts: Timestamp, sig: Int)

  /** Newest-first recent signatures for one (band, value) bucket. */
  case class BucketState(docs: List[(Long, Int)])

  /** `a` is always the earlier-arriving document. */
  case class CandidatePair(a: Long, b: Long, band: Int, hamming: Int)

  private def hamming16(x: Int, y: Int): Int = Integer.bitCount((x ^ y) & 0xffff)

  /** Simhash + band explosion (stateless, codegen'd kernel): one row per
    * (band, band-value) per document.
    */
  def banded(docs: Dataset[DocEvent]): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("sig", graft.plans.TextKernels.simhash16Native(col("text")))
      .select(col("doc_id"), col("ts"), col("sig"))
      .flatMap { r =>
        val sig = r.getInt(2)
        Seq(
          BandedDoc(0, sig & 0xff, r.getLong(0), r.getTimestamp(1), sig),
          BandedDoc(1, (sig >> 8) & 0xff, r.getLong(0), r.getTimestamp(1), sig))
      }
  }

  /** Candidate near-dup pairs against everything previously seen in the
    * same bucket. Works identically over a stream (append mode,
    * micro-batch slices) and a batch Dataset (single slice) — the spec
    * cross-checks the two.
    */
  def candidatePairs(
      docs: Dataset[DocEvent],
      maxHamming: Int = 1,
      maxPerBucket: Int = 256): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    def fn(
        key: (Int, Int),
        rows: Iterator[BandedDoc],
        state: GroupState[BucketState]): Iterator[CandidatePair] = {
      // Arrival order inside a slice is not guaranteed — fix it so batch
      // and micro-batch replays emit identical pairs.
      val sorted = rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
      var seen = state.getOption.map(_.docs).getOrElse(Nil)
      val out = Seq.newBuilder[CandidatePair]
      sorted.foreach { d =>
        seen.foreach { case (id, sig) =>
          if (id != d.doc_id && hamming16(sig, d.sig) <= maxHamming)
            out += CandidatePair(id, d.doc_id, d.band, hamming16(sig, d.sig))
        }
        seen = ((d.doc_id, d.sig) :: seen).take(maxPerBucket)
      }
      state.update(BucketState(seen))
      out.result().iterator
    }
    banded(docs)
      .groupByKey(d => (d.band, d.value))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }
}
