package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Text

/** Streaming KL-drift monitor — q127's continuous face: token traffic
  * streams in per source, the CORPUS distribution is a static reference
  * model (frozen, refreshed out-of-band like the CorpusMonitors LM), and
  * every micro-batch re-emits each source's KL(source ‖ corpus) from its
  * accumulated term counts.
  *
  * Unlike the stream-static monitors, per-source KL needs the source's
  * own distribution — two chained aggregations, which Structured
  * Streaming's SQL surface refuses. This is exactly the
  * `mapGroupsWithState` case (SURVEY §2.11 custom state): state per
  * source is its term-count map — VOCABULARY-bounded, never the token
  * stream — and count folding is pure addition, so the emission after
  * the final micro-batch equals the batch run on the same rows exactly
  * (the spec asserts it; no cross-batch float accumulation exists, the
  * KL is recomputed from exact integer counts at every emission).
  */
object StreamingKlDrift extends Serializable {

  case class TokenRow(source: String, term: String)
  case class DriftRow(source: String, n_terms: Long, n_tokens: Long, kl_vs_corpus: Double)

  /** Static reference: per-term corpus probability (exact ratio, not
    * rounded) plus the add-one smoothed probability an unseen term gets —
    * the streamed traffic is NOT the reference corpus, so OOV terms must
    * score, not crash.
    */
  def referenceModel(reference: DataFrame, textCol: String): (Map[String, Double], Double) = {
    val cnts = reference
      .select(explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = cnts.map(_._2).sum
    val v = cnts.length.toLong
    (cnts.map { case (t, c) => t -> (c.toDouble / total) }.toMap,
      1.0 / (total + v).toDouble)
  }

  private def round(x: Double, dp: Int): Double =
    BigDecimal.valueOf(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Per-source running KL against the static reference. Works on batch
    * and streaming datasets through the same state function (batch = one
    * group call with all rows, the Sessionizer duality). Streaming: run
    * with Update output mode; each micro-batch re-emits the source's
    * current drift. Per-term components land on a 6-dp grid and sum in
    * term order — recomputed from exact counts at every emission.
    */
  def drift(
      tokens: Dataset[TokenRow],
      refPc: Map[String, Double],
      oovPc: Double,
      streaming: Boolean): Dataset[DriftRow] = {
    import tokens.sparkSession.implicits._
    val bc = tokens.sparkSession.sparkContext.broadcast(refPc)

    def emit(source: String, counts: Map[String, Long]): DriftRow = {
      val stot = counts.valuesIterator.sum
      var kl = 0.0
      counts.toSeq.sortBy(_._1).foreach { case (term, c) =>
        val ps = c.toDouble / stot
        val pc = bc.value.getOrElse(term, oovPc)
        kl += round(ps * math.log(ps / pc), 6)
      }
      DriftRow(source, counts.size.toLong, stot, round(kl, 4))
    }

    def fn(
        source: String,
        rows: Iterator[TokenRow],
        state: GroupState[Map[String, Long]]): DriftRow = {
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
