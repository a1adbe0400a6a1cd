package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.Text

/** Streaming lexical-diversity monitor — q151's continuous face: token
  * traffic streams in per source and every micro-batch re-emits the
  * source's type-token ratio and hapax fraction from its accumulated
  * term counts. A collapsing TTR or a spiking hapax fraction mid-crawl
  * flags template spam / OCR noise while the crawl is still running,
  * instead of at the end-of-run q151 audit.
  *
  * Same state discipline as [[StreamingKlDrift]]: per-source state is
  * the term-count map — VOCABULARY-bounded, never the token stream —
  * count folding is pure addition, and every emission recomputes the
  * stats from exact integer counts, so the emission after the final
  * micro-batch EQUALS the batch run on the same rows (the spec asserts
  * equality against the q151 batch query itself; there is no
  * cross-batch float accumulation to drift).
  */
object StreamingLexicalDiversity extends Serializable {

  case class TokenRow(source: String, term: String)
  case class DiversityRow(source: String, n_tokens: Long, n_types: Long,
      n_hapax: Long, ttr: Double, hapax_frac: Double)

  private def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Per-source running diversity stats. Batch and streaming datasets go
    * through the same state function (batch = one group call with all
    * rows — the Sessionizer duality). Streaming: Update output mode;
    * each micro-batch re-emits the source's current stats.
    */
  def diversity(
      tokens: Dataset[TokenRow],
      streaming: Boolean): Dataset[DiversityRow] = {
    import tokens.sparkSession.implicits._

    def emit(source: String, counts: Map[String, Long]): DiversityRow = {
      val nTokens = counts.valuesIterator.sum
      val nTypes = counts.size.toLong
      val nHapax = counts.valuesIterator.count(_ == 1L).toLong
      DiversityRow(source, nTokens, nTypes, nHapax,
        round6(nTypes.toDouble / nTokens),
        round6(nHapax.toDouble / nTypes))
    }

    def fn(
        source: String,
        rows: Iterator[TokenRow],
        state: GroupState[Map[String, Long]]): DiversityRow = {
      val acc = scala.collection.mutable.HashMap.empty[String, Long]
      state.getOption.foreach(m => acc ++= m)
      rows.foreach(r => acc(r.term) = acc.getOrElse(r.term, 0L) + 1L)
      val snapshot = acc.toMap
      if (streaming) state.update(snapshot)
      emit(source, snapshot)
    }

    tokens
      .groupByKey(_.source)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** Adapter: (source, term) token stream from a documents frame. */
  def fromDocuments(docs: DataFrame, sourceCol: String, textCol: String): Dataset[TokenRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(sourceCol).as("source"),
      explode(Text.tokens(col(textCol))).as("term")).as[TokenRow]
  }
}
