package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Vectors

/** Live retrieval-quality monitor — q183's continuous face (33rd
  * streaming face, r9 verdict item 5): as corpus vectors stream in, each
  * is scored against the fixed query set and every query's top-k
  * shortlist is maintained as BOUNDED per-key state (k entries per query
  * vector — the TopKPerKey discipline inside flatMapGroupsWithState);
  * a second commutative counter tracks per-label corpus sizes (the IDCG
  * denominator input). The NDCG@10/MRR rollup runs the SAME metric tail
  * the declared q183 runs ([[graft.QueriesVector.retrievalEvalFinish]]),
  * so converged state reproduces the batch evaluation bit for bit.
  *
  * Contract: NONE on arrival order — the top-k of a set under a total
  * order ((cos desc, vec_id asc); vec_id is unique) is
  * arrival-independent, and label counters commute (the spec feeds fully
  * shuffled chunks). Cosines use [[Vectors.cosineScalar]], the exact
  * scalar mirror of the batch column fold, so shortlist membership can
  * never diverge from the batch TopKPerKey on float grounds.
  *
  * Scale shape: state is |queries| × k shortlist entries plus
  * |labels| counters — both corpus-size-independent, the property that
  * lets the monitor run unbounded.
  */
object StreamingRetrievalEval extends Serializable {

  case class VecEv(vec_id: Long, label: Int, embedding: Seq[Double])
  case class Cand(qid: Long, vec_id: Long, label: Int, cos: Double)
  case class Shortlist(entries: Seq[Cand])
  case class LabelCount(label: Int, n_label: Long)

  /** Event feed: one VecEv per embeddings row (the corpus stream). */
  def fromEmbeddings(e: DataFrame): Dataset[VecEv] = {
    import e.sparkSession.implicits._
    e.select(col("vec_id"), col("label"),
        Vectors.toDoubleVec(col("embedding")).as("embedding"))
      .as[VecEv]
  }

  /** The fixed query set exactly as q183 collects it: vec_id < 8, with
    * labels, id-ordered.
    */
  def queriesOf(e: DataFrame): Seq[(Long, Seq[Double], Int)] =
    e.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toSeq, r.getInt(2)))
      .sortBy(_._1).toSeq

  /** Per-query top-k shortlists, refreshed each micro-batch (Update
    * mode: the sink always holds the current leaderboard per qid).
    */
  def shortlists(
      evs: Dataset[VecEv],
      queries: Seq[(Long, Seq[Double])],
      k: Int = 10,
      streaming: Boolean = true): Dataset[Cand] = {
    import evs.sparkSession.implicits._
    val cands = evs.flatMap(ev => queries.map { case (qid, qv) =>
      Cand(qid, ev.vec_id, ev.label, Vectors.cosineScalar(ev.embedding, qv))
    })
    def ahead(a: Cand, b: Cand): Boolean =
      a.cos > b.cos || (a.cos == b.cos && a.vec_id < b.vec_id)
    def fn(qid: Long, it: Iterator[Cand],
        state: GroupState[Shortlist]): Iterator[Cand] = {
      val merged = (state.getOption.map(_.entries).getOrElse(Nil) ++ it)
        .sortWith(ahead).take(k)
      if (streaming) state.update(Shortlist(merged))
      merged.iterator
    }
    cands.groupByKey(_.qid)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(fn)
  }

  /** Commutative per-label corpus counters (the relCorpus input). */
  def labelCounts(
      evs: Dataset[VecEv], streaming: Boolean = true): Dataset[LabelCount] = {
    import evs.sparkSession.implicits._
    def fn(label: Int, it: Iterator[VecEv],
        state: GroupState[Long]): LabelCount = {
      var n = state.getOption.getOrElse(0L)
      it.foreach(_ => n += 1)
      if (streaming) state.update(n)
      LabelCount(label, n)
    }
    evs.groupByKey(_.label).mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** The batch metric tail over converged state — q183's own finish. */
  def rollup(shortlists: DataFrame, labelCounts: DataFrame,
      qinfo: DataFrame): DataFrame =
    graft.QueriesVector.retrievalEvalFinish(
      shortlists.select(col("qid"), col("vec_id"), col("label"), col("cos")),
      qinfo,
      labelCounts.select(col("label").as("qlabel"), col("n_label")))
}
