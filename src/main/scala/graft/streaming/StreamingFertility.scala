package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming tokenizer-fertility counters — q331's continuous face
  * (29th streaming face): live (docs, chars, tokens) sums per language,
  * so a corpus-ingest operator watches the chars-per-token profile move
  * as documents arrive (a drifting fertility ratio is the first sign a
  * new crawl slice is in the wrong language or encoding).
  *
  * Contract: NONE on arrival order — all three counters are commutative
  * sums (the checksum class; the spec feeds fully shuffled chunks).
  * State is keyed by LANGUAGE: bounded key space, three longs each.
  */
object StreamingFertility extends Serializable {

  case class DocEv(lang: String, nChars: Long, nTok: Long)
  case class LangCount(lang: String, n_docs: Long, tc: Long, tt: Long)

  def counters(evs: Dataset[DocEv], streaming: Boolean): Dataset[LangCount] = {
    import evs.sparkSession.implicits._

    def fn(lang: String, it: Iterator[DocEv],
        state: GroupState[(Long, Long, Long)]): LangCount = {
      var (nd, tc, tt) = state.getOption.getOrElse((0L, 0L, 0L))
      it.foreach { e => nd += 1; tc += e.nChars; tt += e.nTok }
      if (streaming) state.update((nd, tc, tt))
      LangCount(lang, nd, tc, tt)
    }

    evs.groupByKey(_.lang).mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Event feed from the batch documents table: the same whitespace
    * token contract the declared q331 uses.
    */
  def fromDocuments(documents: DataFrame): Dataset[DocEv] = {
    import documents.sparkSession.implicits._
    documents.select(col("lang"), col("n_chars").cast("long").as("nChars"),
        size(graft.functions.Text.tokens(col("text"))).cast("long")
          .as("nTok"))
      .filter(col("nTok") > 0)
      .as[DocEv]
  }

  /** Converged counters → the declared q331 row shape. */
  def rollup(counts: DataFrame): DataFrame =
    counts.select(col("lang"), col("n_docs"),
      round(col("tc").cast("double") / col("tt").cast("double"), 6)
        .as("chars_per_token"),
      round(col("tt").cast("double") / col("n_docs").cast("double"), 6)
        .as("tokens_per_doc"))
}
