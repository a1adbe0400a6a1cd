package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Streaming benchmark-contamination check — the continuous analog of the
  * batch shingle-overlap query (q78 / `SparkEntry`): evaluation documents
  * STREAM in (a benchmark under construction, a submission queue), the
  * pretraining corpus' shingle table is STATIC, and every micro-batch
  * updates the per-eval-doc overlap counts.
  *
  * Scale design, mirroring the batch path exactly:
  *   - candidate generation is a stream-static EQUI-JOIN on the shingle
  *     key — never a doc×doc product;
  *   - the static side carries the same doc-frequency cap as q78 (a
  *     shingle in > `dfCap` train docs is boilerplate, not contamination
  *     signal, and is the skew killer at 100 TB);
  *   - aggregation state is per EVAL doc (benchmarks are small by
  *     definition) with `collect_set` of matched shingles/train ids —
  *     `countDistinct` is unsupported in streaming aggregation, and the
  *     set cardinality is already bounded by the df-cap × shingles/doc.
  *
  * The spec cross-checks a streamed run against the batch query on the
  * same rows.
  */
object StreamingContamination {

  /** Static side: one row per (shingle, train_id), with hot shingles
    * (doc frequency > `dfCap`) dropped — same construction as q78's
    * train branch. Persist/bucket this by shingle for repeated use.
    */
  def trainShingles(train: DataFrame, idCol: String, textCol: String,
      dfCap: Int = 64): DataFrame = {
    val sh = train.select(col(idCol).as("train_id"),
      explode(array_distinct(
        graft.plans.TextKernels.wordShinglesNative(col(textCol), 3))).as("shingle"))
    val rare = sh.groupBy(col("shingle"))
      .agg(countDistinct(col("train_id")).as("df"))
      .filter(col("df") <= dfCap).select(col("shingle"))
    sh.join(rare, Seq("shingle"), "left_semi")
  }

  /** Streaming side: eval docs (streaming DataFrame with `idCol`,
    * `textCol`) → running (n_shared_shingles, n_contaminating_docs) per
    * eval doc. Run with Update/Complete output mode; each micro-batch
    * revises the counts as more shingles match.
    */
  def contamination(evalDocs: DataFrame, trainSh: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val evalSh = evalDocs.select(col(idCol).as("eval_id"),
      explode(array_distinct(
        graft.plans.TextKernels.wordShinglesNative(col(textCol), 3))).as("shingle"))
    evalSh
      .join(trainSh, Seq("shingle")) // stream-static equi-join
      .groupBy(col("eval_id"))
      .agg(
        size(collect_set(col("shingle"))).as("n_shared_shingles"),
        size(collect_set(col("train_id"))).as("n_contaminating_docs"))
  }
}
