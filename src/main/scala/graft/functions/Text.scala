package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, n-gram shingling, MinHash signatures, SimHash, Jaccard,
  * language-ID scoring, quality scoring, token counting, fingerprinting.
  *
  * All pure `org.apache.spark.sql.functions` compositions (higher-order
  * array functions) — fully codegen'd, no UDFs, so they stay inside
  * whole-stage codegen on a 100 TB scan.
  *
  * Design note on hashing: where a cross-engine-checkable hash is needed
  * (MinHash/SimHash/fingerprints) we use `md5` of UTF-8 bytes — identical
  * bytes-in/hex-out in every engine — rather than engine-private hashes.
  * For pure-Spark hot paths, [[Ids.hashId]] (xxhash64) is cheaper.
  */
object Text {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word-level n-gram shingles ("a b c") from a token array.
    * Empty array when fewer than n tokens (never null — null propagation
    * differs across engines and poisons downstream concat/min).
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(
      size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))
      )
    ).otherwise(array().cast("array<string>"))

  /** md5 hex of a string column (UTF-8). */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))

  /** One MinHash value: lexicographic min over `md5(seed + "|" + shingle)`.
    * A k-permutation signature = k of these with seeds 0..k-1.
    * Returns null on an empty shingle set — callers filter those rows first.
    */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => md5Hex(concat(lit(s"$seed|"), s))))

  /** Full k-wide MinHash signature as an array<string>; null when the
    * shingle set is empty (same contract as the codegen'd
    * [[graft.plans.MinHashSignature]] kernel).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    when(size(shingles) > 0, array((0 until k).map(minhash(shingles, _)): _*))
      .otherwise(lit(null).cast("array<string>"))

  /** LSH band keys: the signature split into `bands` equal bands, each
    * hashed to one string key prefixed with its band index (so keys from
    * different bands never collide). Docs sharing ANY band key are
    * candidate near-duplicates.
    */
  def lshBandKeys(signature: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val rows = k / bands
    array((0 until bands).map { b =>
      md5Hex(
        concat_ws("|", (lit(s"band$b") +: (0 until rows).map(r =>
          element_at(signature, b * rows + r + 1))): _*)
      )
    }: _*)
  }

  /** Per-bit contribution of one token to a SimHash: +1 if the `bit`-th hex
    * digit of md5(token) is >= '8', else -1 (i.e. the top bit of that
    * nibble). 16 hex digits → up to a 16-bit SimHash; enough to bucket
    * near-duplicates while staying cheaply cross-checkable.
    */
  private def simhashBitSign(tokenMd5: Column, bit: Int): Column =
    when(substring(tokenMd5, bit + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), lit(1))
      .otherwise(lit(-1))

  /** 16-bit SimHash of a token array: for each bit, sum the per-token signs
    * over DISTINCT tokens; the bit is set iff the sum is positive.
    */
  def simhash16(toks: Column): Column = {
    val distinctMd5 = transform(array_distinct(toks), md5Hex(_))
    (0 until 16).map { bit =>
      val s = aggregate(
        distinctMd5,
        lit(0),
        (acc, t) => acc + simhashBitSign(t, bit)
      )
      when(s > 0, lit(1 << bit)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Jaccard similarity of the DISTINCT token sets of two token arrays,
    * as a double in [0,1]. Exact integer set sizes divided once — the
    * division is the only float op, so it is deterministic cross-engine.
    */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    val union = size(array_union(da, db)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Count of tokens that appear in a fixed vocabulary (with multiplicity).
    * Building block for stopword-ratio quality metrics and language ID.
    */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(vocab)))

  /** Language-ID by stopword voting: returns the language whose marker-word
    * list scores the most hits (ties broken by language-code order — the
    * alphabetically-first language among the tied maxima wins).
    * An n-gram-free heuristic in the spirit of fastText/langid baselines,
    * expressed as greatest + a when-chain so oracles can mirror it exactly.
    */
  def langIdByStopwords(toks: Column, markers: Map[String, Seq[String]]): Column = {
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      (lang, vocabHits(toks, words))
    }
    val maxHits = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.tail.foldLeft(when(scored.head._2 === maxHits, lit(scored.head._1))) {
      case (acc, (lang, hits)) => acc.when(hits === maxHits, lit(lang))
    }
  }

  /** Heuristic document quality score in [0,100]:
    *   40 pts length in a sane band, 30 pts mean word length in [3,12],
    *   30 pts low punctuation ratio. All integer/ratio arithmetic with a
    *   single final rounding — deterministic cross-engine.
    */
  def qualityScore(text: Column, toks: Column): Column = {
    val nChars = length(text).cast("double")
    val nToks = size(toks).cast("double")
    val meanWordLen = when(nToks > 0, nChars / nToks).otherwise(lit(0.0))
    // Punctuation count as length delta after stripping an explicit char
    // class — identical semantics in Java regex and RE2 (oracle-safe).
    val punct =
      (length(text) - length(regexp_replace(text, "[.,;:!?()-]", ""))).cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(1.0))
    val lenPts = when(nChars >= 100 && nChars <= 20000, lit(40.0))
      .when(nChars >= 20, lit(20.0)).otherwise(lit(0.0))
    val wordPts = when(meanWordLen >= 3 && meanWordLen <= 12, lit(30.0))
      .otherwise(lit(10.0))
    val punctPts = when(punctRatio <= 0.1, lit(30.0))
      .when(punctRatio <= 0.3, lit(15.0)).otherwise(lit(0.0))
    lenPts + wordPts + punctPts
  }

  /** BPE-ish token count: word pieces + digit runs + isolated symbols.
    * Pattern kept to the regex subset with identical semantics in Java
    * regex and RE2 so oracles agree.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Character n-grams of the raw text (empty array below n chars —
    * guarded because a descending `sequence` would otherwise be built).
    */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Language-ID by characteristic character-n-gram counting (the n-gram
    * heuristic of classic langid tools): score each language by how many
    * of the text's char trigrams appear in its profile (with
    * multiplicity); greatest wins, ties to the alphabetically-first code.
    */
  def langIdByCharNgrams(text: Column, profiles: Map[String, Seq[String]]): Column = {
    val grams = charNgrams(lower(text), 3)
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, ps) =>
      (lang, size(filter(grams, g => g.isInCollection(ps))))
    }
    val maxHits = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.tail.foldLeft(when(scored.head._2 === maxHits, lit(scored.head._1))) {
      case (acc, (lang, hits)) => acc.when(hits === maxHits, lit(lang))
    }
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken rolling-hash
    * document fingerprinting): hash every char `k`-gram, slide a window
    * of `w` hashes, keep each window's minimum, return the SORTED DISTINCT
    * minima. Near-identical documents share most fingerprints; exact dup
    * detection compares the full set, near-dup the overlap.
    * md5 stands in for the rolling polynomial hash — same selection
    * semantics, cross-engine checkable.
    */
  def winnowingFingerprints(text: Column, k: Int, w: Int): Column = {
    val hashes = transform(charNgrams(lower(text), k), md5Hex(_))
    when(size(hashes) >= w,
      sort_array(array_distinct(
        transform(sequence(lit(1), size(hashes) - (w - 1)),
          i => array_min(slice(hashes, i, lit(w)))))))
      .otherwise(sort_array(array_distinct(
        when(size(hashes) > 0, array(array_min(hashes)))
          .otherwise(array().cast("array<string>")))))
  }

  /** Content-defined document fingerprint: md5 of the sorted distinct
    * token bag of the lower-cased text. Whitespace/word-order insensitive —
    * two docs with the same bag of words collide (the reference's
    * "duplicate detection key" role; cf. SURVEY §2 beyond-parity ops).
    */
  def bagFingerprint(text: Column): Column =
    md5Hex(concat_ws(" ", sort_array(array_distinct(tokens(lower(text))))))

  /** Repetition statistics of a gram array (Gopher-rule style quality
    * signals: "fraction of grams in the most common gram" and "fraction
    * of grams occurring more than once"). Returns
    * `struct(total, top, dup)` — total gram count, the count of the most
    * frequent gram, and the number of grams whose gram occurs >1 time.
    *
    * Computed as ONE linear fold over the SORTED gram array (run-length
    * scan), so a corpus-wide repetition filter is a pure projection:
    * zero shuffles, zero explodes — the 100 TB shape. The equivalent
    * explode → groupBy(doc, gram) → groupBy(doc) plan costs two
    * shuffles and inflates the row count by the gram count first.
    */
  def repetitionStats(grams: Column): Column = {
    val sorted = sort_array(grams)
    // Fold state: (prev gram, current run length, best run, grams-in-runs>1).
    val z = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("top"), lit(0L).as("dup"))
    val folded = aggregate(
      sorted,
      z,
      (acc, g) => {
        val run = acc.getField("run")
        val top = acc.getField("top")
        val dup = acc.getField("dup")
        when(g === acc.getField("prev"),
          struct(g.as("prev"), (run + lit(1L)).as("run"),
            top.as("top"), dup.as("dup")))
          .otherwise(
            struct(g.as("prev"), lit(1L).as("run"),
              greatest(top, run).as("top"),
              (dup + when(run > 1L, run).otherwise(lit(0L))).as("dup")))
      },
      acc => {
        val run = acc.getField("run")
        struct(
          greatest(acc.getField("top"), run).as("top"),
          (acc.getField("dup") +
            when(run > 1L, run).otherwise(lit(0L))).as("dup"))
      })
    struct(
      size(grams).cast("long").as("total"),
      folded.getField("top").as("top"),
      folded.getField("dup").as("dup"))
  }
}
