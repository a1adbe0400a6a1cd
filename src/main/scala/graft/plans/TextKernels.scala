package graft.plans

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the per-document text fingerprints whose
  * higher-order-function formulations re-evaluate hashes per reference
  * (SimHash inlines the token-md5 array into each of 16 bit aggregates;
  * winnowing re-slices the hash array per window). Each kernel hashes
  * every token/gram exactly once in a tight loop inside whole-stage
  * codegen. Byte-identical to the HOF formulations in
  * [[graft.functions.Text]] — guarded by parity specs.
  */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash16(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.simhash16($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** Sorted distinct winnowing fingerprints (see
  * [[graft.functions.Text.winnowingFingerprints]]) computed in one pass.
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.winnowing(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.winnowing($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprints =
    copy(child = newChild)
}

/** All sliding character n-grams of a string in ONE pass, emitted as an
  * array ready for `explode`. The compositional form
  * (`explode(sequence(...))` then `substr(text, pos, n)`) forces every
  * exploded row to carry a full copy of `text` into the substring
  * projection — a ~300-byte copy per POSITION that dominated q94's
  * runtime (15 s → 4 s at sf0.1 when replaced by this kernel). Gram
  * extraction is `UTF8String.substringSQL`, the exact code `substr`
  * runs, so semantics (code-point addressing) are unchanged.
  */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "gram length must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.charGrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.charGrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

/** Word n-gram shingles in ONE pass — byte-identical to the HOF form
  * `Text.wordShingles(Text.tokens(text), n)` (FunctionsSpec parity test,
  * including the space-only-trim + `\s+`-split edge semantics), but
  * without its per-shingle interpreted `transform` lambda: the HOF
  * projection alone cost 3.5 s at sf0.1 in q109's probe; this kernel is
  * one tokenize + one StringBuilder sweep per row.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle width must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wordShingleArray(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.wordShingleArray($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Char-trigram language ID (see [[graft.functions.Text.langIdByCharNgrams]]):
  * the HOF form re-evaluates the gram array once per profile filter plus
  * once per tie-break comparison (~11x for 5 languages); this kernel scans
  * the text once with a gram→language lookup table.
  */
case class CharNgramLangId(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  @transient private lazy val table: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    profiles.zipWithIndex.foreach { case ((_, grams), i) =>
      grams.foreach { g =>
        val prev = m.get(g)
        m.put(g, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }
  @transient private lazy val langs: Array[String] = profiles.map(_._1).toArray
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.langId(input.asInstanceOf[UTF8String], table, langs)
  // No doGenCode: per-row work dominates; CodegenFallback-style eval via
  // the interpreted path is fine because the kernel itself is one scan.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdExpr", this)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.kernelEval($c);"
    })
  }
  /** Public entry for generated code. */
  def kernelEval(s: UTF8String): UTF8String =
    TextKernels.langId(s, table, langs)
  override protected def withNewChildInternal(newChild: Expression): CharNgramLangId =
    copy(child = newChild)
}

/** Word n-gram repetition statistics (Gopher-rule quality signals) in one
  * pass: tokenize, build grams, sort, run-length scan. Matches
  * [[graft.functions.Text.repetitionStats]] exactly — total/top/dup are
  * functions of the gram MULTISET, so any total order groups equal grams
  * and the sort-order difference between engines cannot matter. The HOF
  * form pays an interpreted lambda call per fold step (~600k steps at
  * sf0.1 → seconds); this is a tight loop in whole-stage codegen.
  */
case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.repetitionStats(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.repetitionStats($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** Codegen'd Jaro–Winkler similarity (Winkler 1990: Jaro with a
  * common-prefix boost of 0.1 per char up to 4, applied only above the
  * standard 0.7 gate). A native scalar `Expression` (extension-ladder
  * tier b) — inside whole-stage codegen the per-pair cost is two char
  * walks with a match window, no UDF boxing, no row serialization.
  * DuckDB ships the same definition as `jaro_winkler_similarity`, so
  * the oracle is the built-in (both sides rounded to 6 dp — the float
  * tolerance for an identical formula evaluated in two engines).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.TextKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** TRUE Damerau–Levenshtein distance (adjacent transpositions cost 1
  * even across intervening edits — 'CA'→'ABC' = 2 where the restricted
  * OSA form says 3). DuckDB ships the same variant as
  * `damerau_levenshtein`, so the oracle is the built-in; Spark has no
  * native form (a UDF would box every row), hence this codegen'd
  * kernel. UTF-16 code units, the [[JaroWinkler]] contract.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.TextKernels.damerauLevenshtein($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

/** Longest-common-prefix LENGTH in UTF-16 code units — the affix
  * primitive of prefix-blocked fuzzy joins (a pair with lcp ≥ k shares
  * the length-k blocking key by construction, so the kernel doubles as
  * the verify step of prefix blocking). Spark has no native form; a
  * UDF would box every row — this is one static call inside
  * whole-stage codegen, same contract as [[JaroWinkler]].
  */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.commonPrefixLen(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.TextKernels.commonPrefixLen($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLen =
    copy(left = newLeft, right = newRight)
}

/** Deterministic unit-interval hash u ∈ [0,1): the first 4 bytes of
  * md5(key) read big-endian unsigned, over 2³². BIT-IDENTICAL to the
  * engine's established column idiom
  * `conv(substring(md5(key),1,8),16,10)/4294967296.0` (the first 8 hex
  * chars ARE the first 4 bytes) and to the DuckDB oracle form
  * `concat('0x', substr(md5(key),1,8))::BIGINT / 2^32` — but computed
  * without materializing the 32-char hex string or parsing it back:
  * one digest, four byte reads, inside whole-stage codegen. The idiom
  * powers every deterministic sampling/splitting query (hash split,
  * weighted clocks, bootstrap multiplicities, noise draws).
  */
case class UnitHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.unitHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.unitHash($c)")
  override protected def withNewChildInternal(newChild: Expression): UnitHash =
    copy(child = newChild)
}

object TextKernels {

  // MessageDigest is stateful; one per thread, reset per call — the
  // per-row getInstance() of the naive form dominates at corpus scale.
  private val md5Local: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  def unitHash(s: UTF8String): Double = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v.toDouble / 4294967296.0
  }

  def unitHashNative(key: Column): Column =
    ColumnBridge.column(UnitHash(ColumnBridge.expression(key)))


  /** Textbook Jaro–Winkler over UTF-16 code units (names here are
    * ASCII; for full Unicode the contract would move to code points).
    */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val la = a.length
    val lb = b.length
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true; matchedB(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // Transpositions: aligned walk over the matched chars of each side.
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    // Winkler prefix boost, standard 0.7 gate, prefix capped at 4.
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < math.min(4, math.min(la, lb)) && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Count profile-gram hits (with multiplicity) per language over the
    * lower-cased text's char trigrams; return the max-hit language,
    * ties to the first in `langs` order (callers pass sorted codes).
    */
  def langId(
      text: UTF8String,
      table: java.util.HashMap[String, Array[Int]],
      langs: Array[String]): UTF8String = {
    val t = text.toString.toLowerCase
    val hits = new Array[Int](langs.length)
    var i = 0
    val n = t.length - 2
    while (i < n) {
      val ls = table.get(t.substring(i, i + 3))
      if (ls != null) {
        var j = 0
        while (j < ls.length) { hits(ls(j)) += 1; j += 1 }
      }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < langs.length) { if (hits(j) > hits(best)) best = j; j += 1 }
    UTF8String.fromString(langs(best))
  }

  def langIdNative(text: Column, profiles: Map[String, Seq[String]]): Column =
    ColumnBridge.column(CharNgramLangId(
      ColumnBridge.expression(text), profiles.toSeq.sortBy(_._1)))

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

  /** 16-bit SimHash over DISTINCT whitespace tokens: for bit j, +1 when
    * the j-th hex digit of md5(token) is >= '8' else -1; bit set iff the
    * sum is positive. Matches `Text.simhash16(Text.tokens(c))`.
    */
  def simhash16(text: UTF8String): Int = {
    val toks = text.toString.trim.split("\\s+", -1)
    val seen = new java.util.HashSet[String]()
    val sums = new Array[Int](16)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        md.reset()
        val d = md.digest(toks(i).getBytes("UTF-8"))
        var j = 0
        while (j < 16) {
          // j-th hex digit is the high nibble of byte j/2 for even j,
          // low nibble for odd j; digit >= 8 iff its top bit is set.
          val nibble =
            if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf
          sums(j) += (if (nibble >= 8) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0
    var j = 0
    while (j < 16) { if (sums(j) > 0) out |= (1 << j); j += 1 }
    out
  }

  /** Winnowing: md5 every lower-cased char k-gram, take the min hex per
    * sliding window of w, return sorted distinct minima. Matches
    * `Text.winnowingFingerprints(c, k, w)` byte-for-byte (including the
    * short-document single-min and empty cases).
    */
  def winnowing(text: UTF8String, k: Int, w: Int): ArrayData = {
    val t = text.toString.toLowerCase
    val n = t.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[String](n)
    var i = 0
    while (i < n) {
      md.reset()
      hashes(i) = toHex(md.digest(t.substring(i, i + k).getBytes("UTF-8")))
      i += 1
    }
    val mins = new java.util.TreeSet[String]()
    if (n < w) {
      var m = hashes(0)
      var j = 1
      while (j < n) { if (hashes(j) < m) m = hashes(j); j += 1 }
      mins.add(m)
    } else {
      // Sliding min over windows of w hex strings. w is small (4-16):
      // a direct scan per window start beats a deque for these sizes.
      var s = 0
      while (s + w <= n) {
        var m = hashes(s)
        var j = s + 1
        while (j < s + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
        mins.add(m)
        s += 1
      }
    }
    val out = new Array[AnyRef](mins.size)
    val it = mins.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** One-pass word n-gram repetition stats; see [[RepetitionStats]]. */
  def repetitionStats(text: UTF8String, n: Int): InternalRow = {
    val toks = text.toString.trim.split("\\s+", -1)
    val m = toks.length - (n - 1)
    if (m <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val grams = new Array[String](m)
    if (n == 1) {
      System.arraycopy(toks, 0, grams, 0, m)
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        grams(i) = sb.toString
        i += 1
      }
    }
    java.util.Arrays.sort(grams.asInstanceOf[Array[AnyRef]])
    var top = 0L
    var dup = 0L
    var run = 1L
    var i = 1
    while (i < m) {
      if (grams(i) == grams(i - 1)) run += 1
      else {
        if (run > top) top = run
        if (run > 1) dup += run
        run = 1
      }
      i += 1
    }
    if (run > top) top = run
    if (run > 1) dup += run
    new GenericInternalRow(Array[Any](m.toLong, top, dup))
  }

  /** One-pass word shingling (see [[WordShingles]]). Mirrors the HOF
    * pipeline exactly: SQL `trim` strips SPACES only (not tabs), then
    * `\s+` split — both Java-regex semantics either way.
    */
  def wordShingleArray(s: UTF8String, n: Int): ArrayData = {
    var str = s.toString
    var lo = 0
    var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    str = str.substring(lo, hi)
    val toks = str.split("\\s+", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def wordShinglesNative(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** One-pass sliding n-gram extraction (see [[CharGrams]]). */
  def charGrams(s: UTF8String, n: Int): ArrayData = {
    val total = s.numChars() - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[Any](total)
    var i = 0
    while (i < total) { out(i) = s.substringSQL(i + 1, n); i += 1 }
    new GenericArrayData(out)
  }

  def charGramsNative(text: Column, n: Int): Column =
    ColumnBridge.column(CharGrams(ColumnBridge.expression(text), n))

  def repetitionStatsNative(text: Column, n: Int): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text), n))

  def simhash16Native(text: Column): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(text)))

  def winnowingNative(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowingFingerprints(ColumnBridge.expression(text), k, w))

  def jaroWinklerNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Lowrance–Wagner true Damerau–Levenshtein: the (n+2)×(m+2) DP with
    * the per-alphabet last-seen row map. O(n·m) time, called from
    * generated code (one static call per row, no boxing).
    */
  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val h = Array.ofDim[Int](la + 2, lb + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= la) { h(i + 1)(0) = inf; h(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { h(0)(j + 1) = inf; h(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = {
          val v = da.get(Character.valueOf(b.charAt(j - 1)))
          if (v == null) 0 else v.intValue
        }
        val j1 = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        val sub = h(i)(j) + cost
        val ins = h(i + 1)(j) + 1
        val del = h(i)(j + 1) + 1
        val tra = h(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        h(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, tra))
        j += 1
      }
      da.put(Character.valueOf(a.charAt(i - 1)), Integer.valueOf(i))
      i += 1
    }
    h(la + 1)(lb + 1)
  }

  def damerauNative(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** UTF-16 code-unit common-prefix length, called from generated code. */
  def commonPrefixLen(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i
  }

  def lcpNative(a: Column, b: Column): Column =
    ColumnBridge.column(CommonPrefixLen(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
