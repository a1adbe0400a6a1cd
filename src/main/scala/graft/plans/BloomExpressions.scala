package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Static bit/hash helpers for the bloom join filter, shared by
  * interpreted eval, generated code, and the build aggregate. TOP-LEVEL
  * object on purpose: Scala emits static forwarders for it, so whole-stage
  * codegen can call `graft.plans.BloomUtil.mightContain(...)` as a plain
  * Java static method.
  *
  * Serialized layout (big-endian, ByteBuffer-compatible):
  * [numHashes: Int][numBits: Int][words: Long...].
  *
  * Hashing is double-hashing over a splitmix64 finalizer:
  * bit_i = (h1 + i*h2) mod numBits. Engine-internal (the filter is never
  * oracle-compared — only the pruned join's exact result is), so no
  * cross-engine hash constraints apply.
  */
object BloomUtil {

  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def setBits(words: Array[Long], numBits: Int, numHashes: Int, key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5555555555555555L) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
      words(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Scan-side probe; allocation-free (reads the probed byte straight out
    * of the serialized array: bit `b` of a big-endian long lives in byte
    * `7 - b/8` at in-byte position `b%8`).
    */
  def mightContain(bloom: Array[Byte], key: Long): Boolean = {
    val numHashes = readInt(bloom, 0)
    val numBits = readInt(bloom, 4)
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5555555555555555L) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
      val bitInWord = idx & 63
      val byteOff = 8 + (idx >>> 6) * 8 + (7 - (bitInWord >>> 3))
      if (((bloom(byteOff) >> (bitInWord & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  def serialize(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * words.length)
    bb.putInt(numHashes)
    bb.putInt(numBits)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

/** Bloom-filter runtime join pruning as first-class library pieces — the
  * plan shape Spark's own `InjectRuntimeFilter` produces, made explicit
  * and user-steerable:
  *
  *   1. [[BloomExpressions.BloomBuild]]: a distributed
  *      `TypedImperativeAggregate` over the dim-side join keys.
  *      Per-partition bitsets, merged by bitwise OR at the (1-row)
  *      shuffle — the build never centralizes the keys.
  *   2. [[BloomExpressions.BloomMightContain]]: a codegen'd scan-side
  *      predicate over the serialized filter, applied to the fact table
  *      BEFORE its shuffle, so at 100 TB the join exchanges only rows
  *      whose keys plausibly exist on the dim side (false positives are
  *      removed by the join itself, so results stay exact).
  *
  * The filter travels as a 1-row broadcast, not a driver collect — see
  * [[graft.operators.BloomJoin.prunedJoin]].
  */
object BloomExpressions {

  /** Distributed bloom build over a LONG key column. Buffer is a primitive
    * long array (numBits/64 words); merge is bitwise OR, so the aggregate
    * is commutative, associative, and shuffle-cheap (one buffer per
    * partition). Output: the serialized filter (BinaryType).
    */
  case class BloomBuild(
      child: Expression,
      numBits: Int,
      numHashes: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    require(numHashes > 0, "numHashes must be positive")

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](numBits / 64)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) BloomUtil.setBits(buf, numBits, numHashes, v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) |= other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any =
      BloomUtil.serialize(buf, numBits, numHashes)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * buf.length)
      var i = 0
      while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = createAggregationBuffer()
      var i = 0
      while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
      buf
    }

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "bloom_build"

    override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): BloomBuild =
      copy(child = newChild)
  }

  /** Codegen'd `might_contain(key, bloom)` — a static-call probe inside
    * whole-stage codegen, so the fact-side scan filter costs a few hashes
    * per row and no allocation.
    */
  case class BloomMightContain(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = BooleanType

    override def nullSafeEval(key: Any, bloom: Any): Any =
      BloomUtil.mightContain(bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (key, bloom) =>
        s"${ev.value} = graft.plans.BloomUtil.mightContain($bloom, $key);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BloomMightContain =
      copy(left = newLeft, right = newRight)
  }

  /** Column-facing builder: `bloomBuild(col("pk"), 1 << 18, 5)`. */
  def bloomBuild(keyCol: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomBuild(ColumnBridge.expression(keyCol.cast("long")), numBits, numHashes)
        .toAggregateExpression())

  /** Column-facing probe: `mightContain(col("fk"), col("__bloom"))`. */
  def mightContain(keyCol: Column, bloomCol: Column): Column =
    ColumnBridge.column(
      BloomMightContain(
        ColumnBridge.expression(keyCol.cast("long")),
        ColumnBridge.expression(bloomCol)))
}
