package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature of a text column: tokenize (trim + `\s+`),
  * build word `shingleN`-grams, and for each seed 0..k-1 take the
  * lexicographic minimum of `md5("<seed>|<shingle>")` hex digests.
  *
  * Produces EXACTLY the bytes of the composable-functions formulation
  * (`Text.minhashSignature` over `Text.wordShingles(Text.tokens(c), n)`)
  * and of the DuckDB oracle — md5 of UTF-8, lowercase hex, lexicographic
  * min (hex order == unsigned digest-byte order, so the min is tracked on
  * raw digests and hex-encoded once at the end).
  *
  * Why an Expression: the HOF pipeline allocates per-row arrays and runs
  * interpreted lambdas per shingle×seed; this runs one tight loop per row
  * inside whole-stage codegen (the generated code calls the static
  * [[MinHashSignature.compute]]). Returns null when the text has fewer
  * than `shingleN` tokens (callers drop those rows).
  */
case class MinHashSignature(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.MinHashSignature.compute($c, $k, $shingleN);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  // compute() returns null for short docs, so the expression is nullable
  // even for non-null input.
  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** LSH band keys computed in the same one-pass kernel (digests once,
  * band hashes directly). Use THIS (not [[MinHashSignature]] + per-band
  * `element_at`) when only band keys are needed: referencing a computed
  * array column B times makes Catalyst's project-collapse inline — and
  * re-evaluate — the whole signature expression per reference; a single
  * exploded band-keys array evaluates the kernel exactly once per row.
  */
case class MinHashBandKeys(child: Expression, k: Int, bands: Int, shingleN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.computeBandKeys(input.asInstanceOf[UTF8String], k, bands, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.MinHashSignature.computeBandKeys($c, $k, $bands, $shingleN);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashSignature {

  private val hexChars = "0123456789abcdef".toCharArray

  private val seedPrefixes: Array[Array[Byte]] =
    (0 until 64).map(s => (s.toString + "|").getBytes("UTF-8")).toArray

  /** Static kernel shared by interpreted eval and generated code.
    * Loop order: per shingle build its bytes ONCE, then digest once per
    * seed — token bytes are encoded once per row, shingle bytes once per
    * shingle, so the inner loop is pure MD5.
    */
  def compute(text: UTF8String, k: Int, shingleN: Int): ArrayData = {
    val minDigests = minhashDigests(text, k, shingleN)
    if (minDigests == null) return null
    new GenericArrayData(minDigests.map(d => UTF8String.fromString(toHex(d))))
  }

  /** Band keys straight from the digests: the b-th key is
    * md5("band<b>|<hex>|<hex>|...") over that band's k/bands signature
    * values — byte-identical to `Text.lshBandKeys` over [[compute]].
    */
  def computeBandKeys(text: UTF8String, k: Int, bands: Int, shingleN: Int): ArrayData = {
    val minDigests = minhashDigests(text, k, shingleN)
    if (minDigests == null) return null
    val rows = k / bands
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      val sb = new StringBuilder(8 + 33 * rows)
      sb.append("band").append(b)
      var r = 0
      while (r < rows) {
        sb.append('|').append(toHex(minDigests(b * rows + r)))
        r += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes("UTF-8"))
      out(b) = UTF8String.fromString(toHex(digest))
      b += 1
    }
    new GenericArrayData(out)
  }

  private def minhashDigests(text: UTF8String, k: Int, shingleN: Int): Array[Array[Byte]] = {
    // Tokenization identical to split(trim(text), "\\s+") in Spark SQL.
    val toks = text.toString.trim.split("\\s+", -1)
    val nShingles = toks.length - shingleN + 1
    if (nShingles <= 0) return null
    val tokBytes = new Array[Array[Byte]](toks.length)
    var t = 0
    while (t < toks.length) { tokBytes(t) = toks(t).getBytes("UTF-8"); t += 1 }
    val md = MessageDigest.getInstance("MD5")
    val minDigests = Array.ofDim[Byte](k, 16)
    val seen = new Array[Boolean](k)
    var shingleBuf = new Array[Byte](64)
    var i = 0
    while (i < nShingles) {
      // Assemble "<tok_i> <tok_i+1> ..." into a reused buffer.
      var len = 0
      var j = 0
      while (j < shingleN) {
        val tb = tokBytes(i + j)
        val need = len + tb.length + 1
        if (need > shingleBuf.length) {
          val grown = new Array[Byte](math.max(need, shingleBuf.length * 2))
          System.arraycopy(shingleBuf, 0, grown, 0, len)
          shingleBuf = grown
        }
        if (j > 0) { shingleBuf(len) = ' '.toByte; len += 1 }
        System.arraycopy(tb, 0, shingleBuf, len, tb.length)
        len += tb.length
        j += 1
      }
      var seed = 0
      while (seed < k) {
        md.reset()
        md.update(
          if (seed < seedPrefixes.length) seedPrefixes(seed)
          else (seed.toString + "|").getBytes("UTF-8"))
        md.update(shingleBuf, 0, len)
        val digest = md.digest()
        if (!seen(seed) || unsignedLess(digest, minDigests(seed))) {
          System.arraycopy(digest, 0, minDigests(seed), 0, 16)
          seen(seed) = true
        }
        seed += 1
      }
      i += 1
    }
    minDigests
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Column-level API. */
  def minhashSignatureNative(text: Column, k: Int, shingleN: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(text), k, shingleN))

  /** Column-level API for direct band keys (the candidate-pair hot path). */
  def minhashBandKeysNative(text: Column, k: Int, bands: Int, shingleN: Int): Column =
    ColumnBridge.column(
      MinHashBandKeys(ColumnBridge.expression(text), k, bands, shingleN))
}
