package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.graph.OntologyGraph
import graft.multimodal.Multimodal
import graft.sources.{Obo, Ontolia}

/** Property tests over the pure (no-SparkSession) kernels. */
object KernelProps extends Properties("graft-kernels") {

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val words: Gen[List[String]] = Gen.listOfN(12, word)

  property("minhash kernel matches a naive reference implementation") =
    forAll(words, Gen.chooseNum(1, 3)) { (ws, n) =>
      val text = ws.mkString(" ")
      val got = graft.plans.MinHashSignature.compute(UTF8String.fromString(text), 4, n)
      val toks = text.trim.split("\\s+", -1).toSeq
      val shingles = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      if (shingles.isEmpty) Prop(got == null)
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        def md5hex(s: String): String =
          md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val expected = (0 until 4).map(seed =>
          shingles.map(sh => md5hex(s"$seed|$sh")).min)
        Prop(got != null && (0 until 4).forall(i =>
          got.getUTF8String(i).toString == expected(i)))
      }
    }

  property("jaroWinkler: bounds, identity, symmetry, disjoint-zero") =
    forAll(word, word) { (a, b) =>
      def jw(x: String, y: String) = graft.plans.TextKernels.jaroWinkler(
        UTF8String.fromString(x), UTF8String.fromString(y))
      val s = jw(a, b)
      Prop(s >= 0.0 && s <= 1.0) &&
        Prop(jw(a, a) == 1.0) &&
        Prop(s == jw(b, a)) &&
        // Strings over disjoint alphabets share no matches → exactly 0.
        Prop(jw("aaa", "bbb") == 0.0)
    }

  property("damerauLevenshtein: TRUE-DL variant values, identity, symmetry, lev upper bound") =
    forAll(word, word) { (a, b) =>
      def dl(x: String, y: String) = graft.plans.TextKernels.damerauLevenshtein(
        UTF8String.fromString(x), UTF8String.fromString(y))
      def lev(x: String, y: String) = UTF8String.fromString(x)
        .levenshteinDistance(UTF8String.fromString(y))
      // The variant pins: true DL (Lowrance–Wagner) gives CA→ABC = 2
      // where the restricted OSA form gives 3 — DuckDB's builtin (the
      // oracle) agrees on 2, which is what q353 hash-checks at scale.
      Prop(dl("CA", "ABC") == 2) &&
        Prop(dl("ab", "ba") == 1) &&
        Prop(dl("abcdef", "abdcef") == 1) &&
        Prop(dl("kitten", "sitting") == 3) &&
        Prop(dl(a, a) == 0) &&
        Prop(dl(a, b) == dl(b, a)) &&
        Prop(dl(a, b) <= lev(a, b)) // transpositions only ever help
    }

  property("ontolia parse roundtrips well-formed lines") =
    forAll(word, Gen.nonEmptyListOf(word)) { (reg, ts) =>
      val line = s"  $reg = ${ts.mkString(" , ")} "
      Ontolia.parseLine(line).contains(
        Ontolia.RegimenLink(reg, ts.map(_.trim).mkString(",")))
    }

  property("obo parse emits one term per [Term] stanza") =
    forAll(Gen.listOfN(5, Gen.zip(word, word))) { idNames =>
      val text = idNames.map { case (id, name) =>
        s"[Term]\nid: X:$id\nname: $name\n"
      }.mkString("\n")
      Obo.parse(text.linesIterator).size == idNames.size
    }

  property("updateTermName never leaves doubled whitespace") =
    forAll(Gen.listOfN(5, Gen.oneOf("Malignant", "Neoplasm", "Lung", " ", "X"))) { parts =>
      val out = OntologyGraph.updateTermName(parts.mkString(" "))
      !out.contains("  ") && out == out.trim
    }

  property("stubDecode is deterministic with fixed dim and bounded values") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)), Gen.chooseNum(1, 32)) {
      (bytes, dim) =>
        val payload = bytes.toArray
        val a = Multimodal.stubDecode(payload, dim)
        val b = Multimodal.stubDecode(payload.clone(), dim)
        a.toSeq == b.toSeq && a.length == dim && a.forall(v => v > -1.0f && v < 1.0f)
    }

  property("simhash kernel matches a naive reference implementation") =
    forAll(words) { ws =>
      val text = ws.mkString(" ")
      val got = graft.plans.TextKernels.simhash16(UTF8String.fromString(text))
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5hex(s: String): String =
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val toks = text.trim.split("\\s+", -1).distinct
      val expected = (0 until 16).map { bit =>
        // hex digit >= '8' in ASCII covers '8','9','a'..'f'
        val s = toks.map(t => if (md5hex(t).charAt(bit) >= '8') 1 else -1).sum
        if (s > 0) 1 << bit else 0
      }.sum
      got == expected
    }

  property("charGrams kernel matches naive sliding substrings") =
    forAll(Gen.asciiPrintableStr, Gen.chooseNum(1, 8)) { (t, n) =>
      val got = graft.plans.TextKernels.charGrams(UTF8String.fromString(t), n)
      val expected = if (t.length < n) Seq.empty[String]
        else (0 to t.length - n).map(i => t.substring(i, i + n))
      Prop(got.numElements == expected.size &&
        expected.indices.forall(i =>
          got.getUTF8String(i).toString == expected(i)))
    }

  property("winnowing kernel: sorted distinct minima, subset of gram hashes") =
    forAll(Gen.alphaNumStr, Gen.chooseNum(2, 6), Gen.chooseNum(2, 5)) { (t, k, w) =>
      val out = graft.plans.TextKernels.winnowing(UTF8String.fromString(t), k, w)
      if (t.length < k) Prop(out.numElements() == 0)
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        def md5hex(s: String): String =
          md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val lower = t.toLowerCase
        val grams = (0 to lower.length - k).map(i => md5hex(lower.substring(i, i + k)))
        val got = (0 until out.numElements()).map(out.getUTF8String(_).toString)
        Prop(got == got.sorted && got.distinct == got &&
          got.toSet.subsetOf(grams.toSet) && got.nonEmpty)
      }
    }

  property("cleanName is idempotent") =
    forAll { (s: String) =>
      val once = graft.functions.Cleaning.cleanName(s)
      graft.functions.Cleaning.cleanName(once) == once
    }

  property("drawdown identity: clamp-at-zero fold == cum - min(0, runmin(cum)) (the q232 rewrite)") =
    forAll(Gen.listOf(Gen.chooseNum(-1000L, 1000L))) { deltas =>
      val folded = deltas.scanLeft(0L)((b, d) => math.max(0L, b + d)).tail
      val cums = deltas.scanLeft(0L)(_ + _).tail
      val runmins = cums.scanLeft(Long.MaxValue)(math.min).tail
      val closed = cums.zip(runmins).map { case (c, m) => c - math.min(0L, m) }
      folded == closed
    }

  property("commonPrefixLen: definition, identity, symmetry, block consistency") =
    forAll(word, word) { (a, b) =>
      val ua = UTF8String.fromString(a); val ub = UTF8String.fromString(b)
      val got = graft.plans.TextKernels.commonPrefixLen(ua, ub)
      val ref = a.zip(b).takeWhile { case (x, y) => x == y }.size
      got == ref &&
        graft.plans.TextKernels.commonPrefixLen(ua, ua) == a.length &&
        got == graft.plans.TextKernels.commonPrefixLen(ub, ua) &&
        // The q385 blocking soundness: lcp >= k implies equal k-prefix.
        (got < 3 || a.take(3) == b.take(3))
    }

  property("frameCrossingFingerprint: amplitude invariance, byte bounds, crossing conservation") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf(Gen.chooseNum(-1.0, -0.01),
        Gen.chooseNum(0.01, 1.0))), Gen.chooseNum(1.1, 5.0)) { (xs, scale) =>
      val s = xs.toArray
      val fp = graft.multimodal.AudioCodec.frameCrossingFingerprint(s)
      val scaled = s.map(_ * scale)
      val bytes = (0 until 8).map(f => (fp >> (8 * f)) & 255L)
      val crossings = graft.multimodal.AudioCodec.zeroCrossings(s)
      // sign-only: re-leveling the clip never changes the fingerprint
      graft.multimodal.AudioCodec.frameCrossingFingerprint(scaled) == fp &&
        fp >= 0L &&
        // every frame count bounded by its span (and the 255 cap)
        bytes.forall(b => b >= 0L && b <= 255L) &&
        // unsaturated frames conserve the clip's total crossing count
        (crossings > 255L || bytes.sum == crossings)
    }

  property("unitHash: [0,1) range and first-4-md5-bytes definition") =
    forAll(word) { s =>
      val u = graft.plans.TextKernels.unitHash(UTF8String.fromString(s))
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val ref = java.lang.Long.parseLong(hex.take(8), 16).toDouble / 4294967296.0
      u >= 0.0 && u < 1.0 && u == ref
    }
}
