package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native sketch aggregates (`TypedImperativeAggregate`) — the scale tier
  * below typed `Aggregator`s: the buffer is a mutable JVM object held
  * per group with NO per-row encoder round-trip, serialized only at
  * shuffle boundaries. The typed-`Aggregator` KMV in
  * [[graft.functions.Aggregators.KmvDistinct]] re-encodes a boxed
  * `Seq[Double]` on every row (~4× the cost of a plain scan at sf0.1);
  * this one keeps a primitive-backed ordered buffer and pays
  * serialization O(k) once per partition.
  */
object SketchAggregates {

  /** KMV (k-minimum-values) distinct sketch: keep the k smallest DISTINCT
    * unit-interval hash values; estimate is exact count below k, else
    * `(k-1)/h_k`. Same math as the typed-Aggregator form and the q75
    * DuckDB oracle — a pure function of the input hash SET, so it hashes
    * identically cross-engine.
    *
    * Buffer: `java.util.TreeSet` (ordered, deduped, O(log k) insert) with
    * an O(1) reject of values that can never enter a full buffer — the
    * common case on large groups, making steady-state per-row cost one
    * compare.
    */
  case class KmvSketch(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]]
    with UnaryLike[Expression] {

    require(k > 1, "KMV needs k > 1")

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
      new java.util.TreeSet[java.lang.Double]()

    private def insert(buf: java.util.TreeSet[java.lang.Double], d: Double): Unit =
      if (buf.size < k) { buf.add(d); () }
      else if (d < buf.last()) {          // full + d >= max: can't enter, O(1) reject
        if (buf.add(d)) { buf.pollLast(); () }
      }

    override def update(
        buf: java.util.TreeSet[java.lang.Double],
        input: InternalRow): java.util.TreeSet[java.lang.Double] = {
      val v = child.eval(input)
      if (v != null) insert(buf, v.asInstanceOf[Double])
      buf
    }

    override def merge(
        buf: java.util.TreeSet[java.lang.Double],
        other: java.util.TreeSet[java.lang.Double]): java.util.TreeSet[java.lang.Double] = {
      val it = other.iterator()
      var open = true
      while (open && it.hasNext) {
        val d = it.next().doubleValue()
        insert(buf, d)
        // other is ascending: once one value bounces off a full buffer,
        // every remaining one would too.
        open = buf.size < k || d < buf.last()
      }
      buf
    }

    override def eval(buf: java.util.TreeSet[java.lang.Double]): Any =
      if (buf.size < k) buf.size.toDouble else (k - 1).toDouble / buf.last()

    override def serialize(buf: java.util.TreeSet[java.lang.Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * buf.size)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putDouble(it.next().doubleValue())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.add(bb.getDouble); i += 1 }
      buf
    }

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = false
    override def prettyName: String = "kmv_sketch"

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KmvSketch =
      copy(child = newChild)
  }

  /** Column-facing constructor: `kmvDistinct(col("hv"), 64)`. */
  def kmvDistinct(hashCol: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(hashCol), k).toAggregateExpression())
}
