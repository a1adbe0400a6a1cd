package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** SpaceSaving counter maintenance shared by the batch aggregate
  * ([[SketchAggregates.SpaceSaving]]) and the streaming top-k state
  * ([[graft.streaming.StreamingTopK]]) — ONE implementation so the two
  * paths cannot drift. Deterministic eviction: min count, ties to the
  * lexicographically largest key.
  */
object SpaceSavingCore {

  def victim(buf: java.util.HashMap[String, Array[Long]]): String = {
    var vk: String = null
    var vc = Long.MaxValue
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c < vc || (c == vc && e.getKey > vk)) { vk = e.getKey; vc = c }
    }
    vk
  }

  def add(buf: java.util.HashMap[String, Array[Long]], capacity: Int,
      key: String, cnt: Long, err: Long): Unit = {
    val cur = buf.get(key)
    if (cur != null) { cur(0) += cnt; cur(1) += err }
    else if (buf.size < capacity) buf.put(key, Array(cnt, err))
    else {
      val vk = victim(buf)
      val vc = buf.remove(vk)(0)
      buf.put(key, Array(vc + cnt, vc + err))
    }
  }

  /** Entries sorted by (count desc, key asc). */
  def sorted(buf: java.util.HashMap[String, Array[Long]]): Array[(String, Long, Long)] = {
    val entries = new Array[(String, Long, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0), e.getValue()(1))
      i += 1
    }
    entries.sortBy { case (t, c, _) => (-c, t) }
  }
}

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

  /** SpaceSaving heavy hitters over a string column: at most `capacity`
    * counters; a new key evicts the minimum-count entry and inherits its
    * count as `err` (the classic Metwally/Agrawal/El Abbadi summary, so
    * true_count ∈ [cnt - err, cnt]). EXACT whenever the group's distinct
    * count stays within `capacity` — every err is then 0 and the q89
    * oracle checks the counts themselves, the same exact-regime pattern
    * as the KMV sketch (q75).
    *
    * State is O(capacity) per group regardless of input size; merge sums
    * shared keys and re-truncates, so a 100 TB group costs each task one
    * bounded map. All tie-breaks (eviction, truncation, output order)
    * are deterministic: (count, then key) ordering throughout.
    *
    * Output: array<struct<term, cnt, err>> sorted by cnt DESC, term ASC.
    */
  case class SpaceSaving(
      child: Expression,
      capacity: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]]
    with UnaryLike[Expression] {

    require(capacity > 0, "capacity must be positive")

    override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
      new java.util.HashMap[String, Array[Long]]()

    private def add(buf: java.util.HashMap[String, Array[Long]],
        key: String, cnt: Long, err: Long): Unit =
      SpaceSavingCore.add(buf, capacity, key, cnt, err)

    override def update(buf: java.util.HashMap[String, Array[Long]],
        input: InternalRow): java.util.HashMap[String, Array[Long]] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.toString, 1L, 0L)
      buf
    }

    override def merge(
        buf: java.util.HashMap[String, Array[Long]],
        other: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
      // Sum shared keys first (no evictions possible), then insert the
      // rest smallest-last so eviction order is deterministic.
      val pending = new java.util.TreeMap[String, Array[Long]]()
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = buf.get(e.getKey)
        if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
        else pending.put(e.getKey, e.getValue)
      }
      val pit = pending.entrySet().iterator()
      while (pit.hasNext) {
        val e = pit.next()
        add(buf, e.getKey, e.getValue()(0), e.getValue()(1))
      }
      buf
    }

    override def eval(buf: java.util.HashMap[String, Array[Long]]): Any =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        SpaceSavingCore.sorted(buf).map { case (t, c, er) =>
          org.apache.spark.sql.catalyst.InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(t), c, er)
        }.asInstanceOf[Array[Any]])

    override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out.writeUTF(e.getKey)
        out.writeLong(e.getValue()(0))
        out.writeLong(e.getValue()(1))
      }
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val buf = createAggregationBuffer()
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val k = in.readUTF()
        buf.put(k, Array(in.readLong(), in.readLong()))
        i += 1
      }
      buf
    }

    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("term",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("cnt", LongType, nullable = false),
          org.apache.spark.sql.types.StructField("err", LongType, nullable = false))),
        containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "space_saving"

    override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): SpaceSaving =
      copy(child = newChild)
  }

  /** Column-facing constructor: `heavyHitters(col("source"), 64)`. */
  def heavyHitters(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      SpaceSaving(ColumnBridge.expression(c), capacity).toAggregateExpression())

  /** Count-min sketch over an integer key column (any Long — the key is
    * reduced into `[0, p)` before hashing): `DEPTH` rows of `width`
    * counters; each input increments one counter per row
    * (`((a_i·(x mod p) + b_i) mod p) mod width`); a point estimate is the MIN over
    * rows — an upper bound on the true count (Cormode/Muthukrishnan),
    * exact when no colliding key shares all `DEPTH` buckets.
    *
    * The SpaceSaving summary above answers "what are the top keys"; the
    * count-min answers "how often did THIS key occur" in O(depth·width)
    * state per group with a merge that is a plain vector add — the
    * classic pairing for frequency monitoring over 100 TB streams.
    *
    * Hash constants are public fixed LCGs so the estimate is a pure
    * deterministic function of the input MULTISET — replayable in any
    * engine (the q92 DuckDB oracle recomputes the same counters in SQL;
    * same cross-engine pattern as the q39 hyperplane LCG).
    */
  object CountMinCore {
    val Depth = 4
    val Prime = 2147483647L // 2^31 - 1 (Mersenne)
    val HashA: Array[Long] = Array(1103515245L, 1229782938L, 1103581L, 48271L)
    val HashB: Array[Long] = Array(12345L, 1013904223L, 7919L, 11L)
    // Reduce the key into [0, Prime) FIRST: `a_i * x` on a raw Long key
    // overflows for |x| >= ~8.4e9, flipping the sign so `%` returns a
    // negative index (update would throw / mis-address) — and the same
    // product THROWS under ANSI mode on the cmEstimate probe side. After
    // the floorMod the product is bounded by a_max * (p-1) < 2^62, so
    // every intermediate stays positive and update/probe/oracle agree
    // for ANY Long key.
    def bucket(i: Int, x: Long, width: Int): Int =
      (((HashA(i) * Math.floorMod(x, Prime) + HashB(i)) % Prime) % width).toInt
  }

  case class CountMin(
      child: Expression,
      width: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

    import CountMinCore._

    require(width > 0, "width must be positive")

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](Depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val x = v.asInstanceOf[Long]
        var i = 0
        while (i < Depth) { buf(i * width + bucket(i, x, width)) += 1L; i += 1 }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    /** The flattened `Depth × width` counter matrix (row-major). */
    override def eval(buf: Array[Long]): Any =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * buf.length)
      var i = 0
      while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
      buf
    }

    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "count_min"

    override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): CountMin =
      copy(child = newChild)
  }

  /** Column-facing constructor: `countMin(col("user_id"), 64)`. */
  def countMin(c: Column, width: Int): Column =
    ColumnBridge.column(
      CountMin(ColumnBridge.expression(c), width).toAggregateExpression())

  /** Point-query estimate against a [[CountMin]] sketch column: MIN over
    * the depth rows of the addressed counters. Pure codegen'd built-ins
    * (`element_at` + `least`), so probing stays in whole-stage codegen —
    * the sketch is typically a one-row broadcast side.
    */
  def cmEstimate(sketch: Column, key: Column, width: Int): Column = {
    import org.apache.spark.sql.functions._
    import CountMinCore._
    // pmod == Math.floorMod for positive modulus, so this addresses the
    // SAME buckets as CountMinCore.bucket for any Long key (see there for
    // why the key is reduced before the multiply).
    val kr = pmod(key.cast("long"), lit(Prime))
    least((0 until Depth).map { i =>
      val b = pmod(lit(HashA(i)) * kr + lit(HashB(i)), lit(Prime)) % lit(width.toLong)
      element_at(sketch, (lit(i.toLong * width) + b + 1L).cast("int"))
    }: _*)
  }
}
