package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Descending, Expression, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native per-key top-k — the whole-operator custom-plan tier of the
  * extension ladder (logical node → planner strategy → physical operator),
  * for the one shape Spark's built-ins can't express without sorting
  * whole partitions: `row_number() OVER (PARTITION BY k ORDER BY …) <= n`
  * plans a full shuffle + full sort of EVERY row, then discards all but k
  * per key.
  *
  * This operator plans like an aggregation instead: a PARTIAL pass keeps a
  * bounded k-row buffer per key per input partition (map-side, no sort of
  * the partition, memory O(keys × k)), the exchange then moves at most
  * k × partitions rows per key, and the FINAL pass re-bounds per key after
  * the shuffle. At 100 TB the difference is shuffling k rows per key per
  * partition vs shuffling the corpus.
  *
  * Registered per-session via `spark.experimental.extraStrategies` (no
  * config-file coupling); `TopKPerKey(df, …)` injects the strategy
  * idempotently. Determinism: callers pass a total order (tie-break on a
  * unique column) — same contract as every oracle-checked top-k here.
  *
  * Cardinality contract: partial-pass state is (keys-in-partition × k)
  * buffered rows. That is the win whenever keys ≪ rows (group-by-type,
  * per-source, per-language shapes). When the key is near-unique
  * (keys ≈ rows), no bounding is possible for ANY algorithm and the
  * buffer degenerates to the partition — use the window form (which
  * externalizes its sort) for that shape, exactly as you would fall back
  * from a hash to a sort aggregate.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    distinct: Boolean,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    distinct: Boolean,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val orderExprs = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(
        keyExprs.map(BindReferences.bindReference(_, childOutput)))
      val bound = orderExprs.map { o =>
        val e = BindReferences.bindReference(o.child, childOutput)
        val asc = o.direction == Ascending
        (e, asc, TypeUtils.getInterpretedOrdering(o.child.dataType))
      }
      // rank(a) < rank(b) ⇔ a belongs ahead of b in the kept set; nulls
      // follow Spark's default (FIRST for asc, LAST for desc).
      def cmp(a: Seq[Any], b: Seq[Any]): Int = {
        var i = 0
        while (i < bound.size) {
          val (_, asc, ord) = bound(i)
          val (x, y) = (a(i), b(i))
          val c =
            if (x == null && y == null) 0
            else if (x == null) { if (asc) -1 else 1 }
            else if (y == null) { if (asc) 1 else -1 }
            else if (asc) ord.compare(x, y)
            else -ord.compare(x, y)
          if (c != 0) return c
          i += 1
        }
        0
      }
      val state = mutable.HashMap.empty[InternalRow, mutable.ArrayBuffer[(Seq[Any], InternalRow)]]
      iter.foreach { row =>
        // copyValue: an evaluated UTF8String (or array/struct) aliases the
        // iterator's REUSED unsafe row buffer — buffering it uncopied made
        // every string-ordered comparison read corrupted bytes (primitive
        // sort keys, the only shape exercised before q176, copy by value
        // and never hit this).
        val sortKey: Seq[Any] = bound.map(b => InternalRow.copyValue(b._1.eval(row)))
        val buf = state.getOrElseUpdate(keyProj(row).copy(),
          mutable.ArrayBuffer.empty[(Seq[Any], InternalRow)])
        if (buf.size < limit || cmp(sortKey, buf.last._1) < 0) {
          // insertion into a ≤ k-sized sorted buffer: O(k) per accepted row
          var i = buf.size
          while (i > 0 && cmp(sortKey, buf(i - 1)._1) < 0) i -= 1
          // distinct mode (the KMV-sketch contract): keep the k smallest
          // DISTINCT sort keys — a duplicate of an already-buffered key
          // is skipped, in the partial pass AND in the final merge, so
          // the result is the true k-minimum distinct set regardless of
          // multiplicities or arrival order.
          // CONTRACT: distinct mode guarantees only the SET OF SORT-KEY
          // VALUES. When two rows tie on the sort key but differ in
          // other columns, which physical row represents the key depends
          // on arrival/partition order — callers must either consume the
          // sort key alone (the q436 KMV use: only the hash is read) or
          // pass a sort key that functionally determines the row.
          val dup = distinct && i > 0 && cmp(sortKey, buf(i - 1)._1) == 0
          if (!dup) {
            buf.insert(i, (sortKey, row.copy()))
            if (buf.size > limit) buf.remove(limit)
          }
        }
      }
      state.valuesIterator.flatMap(_.iterator.map(_._2))
    }
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, distinct, child) =>
      TopKPerKeyExec(keys, order, k, distinct, partial = false,
        TopKPerKeyExec(keys, order, k, distinct, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Top `k` rows per `keyCols` group under `orderBy` ((column, ascending)
    * pairs — pass a total order for deterministic output). Injects the
    * planner strategy into the session idempotently.
    */
  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int,
      distinct: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val analyzed = df.queryExecution.analyzed
    def resolve(n: String): Attribute = analyzed.output
      .find(a => spark.sessionState.conf.resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"column '$n' not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(resolve(n), if (asc) Ascending else Descending)
    }
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession],
      TopKPerKeyNode(keyCols.map(resolve), order, k, distinct, analyzed))
  }
}
