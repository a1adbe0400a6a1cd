package graft

import org.apache.spark.sql.functions._
import graft.functions.{Cleaning, Ids, Text, Vectors}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("trimAll strips NBSP and whitespace") {
    val got = Seq("  x y  ").toDF("c")
      .select(Cleaning.trimAll($"c")).as[String].head()
    assert(got == "x y")
  }

  test("squeezeWhitespace collapses runs") {
    val got = Seq("a  b\t\tc ").toDF("c")
      .select(Cleaning.squeezeWhitespace($"c")).as[String].head()
    assert(got == "a b c")
  }

  test("sentinelToNull nulls Not Provided") {
    val got = Seq("Not Provided", "real").toDF("c")
      .select(Cleaning.sentinelToNull($"c")).as[String].collect()
    assert(got.toSeq == Seq(null, "real"))
  }

  test("filterCommentRows drops # rows via nvl semantics") {
    val df = Seq(("#comment", "1"), ("ok", "2"), (null, "3")).toDF("field", "v")
    val kept = Cleaning.filterCommentRows(df).select("v").as[String].collect().sorted
    assert(kept.toSeq == Seq("2", "3"))
  }

  test("typed Aggregators: weighted mean and bounded top-k") {
    import graft.functions.Aggregators
    val wm = new Aggregators.WeightedMean().toColumn
    val ds = Seq((10.0, 1.0), (20.0, 3.0)).toDS()
    assert(ds.select(wm).head() == 17.5)
    val tk = new Aggregators.TopKMin(3).toColumn
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 2.0).toDS()
    assert(vals.select(tk).head() == Seq(1.0, 2.0, 3.0))
  }

  test("native KmvSketch matches the typed-Aggregator KMV exactly") {
    import graft.functions.Aggregators
    import graft.plans.SketchAggregates
    // 500 skewed hash values with duplicates, spread over 8 partitions so
    // merge() and serialize() both run; k=16 < distinct count so the
    // estimator branch is exercised, and a second group stays below k.
    val rows = (1 to 500).map(i => ("big", (i % 97 + 1) / 100.0)) ++
      (1 to 5).map(i => ("small", i / 10.0))
    val df = rows.toDF("g", "hv").repartition(8)
    val native = df.groupBy($"g")
      .agg(SketchAggregates.kmvDistinct($"hv", 16).as("est"))
      .as[(String, Double)].collect().toMap
    val typed = udaf(new Aggregators.KmvDistinct(16),
      org.apache.spark.sql.Encoders.scalaDouble)
    val old = df.groupBy($"g").agg(typed($"hv").as("est"))
      .as[(String, Double)].collect().toMap
    assert(native == old)
    assert(native("small") == 5.0) // below k: exact distinct count
    // full buffer: (k-1)/h_k with h_k the 16th-smallest distinct hash
    val hk = (1 to 97).map(_ / 100.0).distinct.sorted.apply(15)
    assert(math.abs(native("big") - 15.0 / hk) < 1e-12)
  }

  test("binAge buckets ages like the reference") {
    val got = Seq("1", "5", "45", "61", "not an age", null)
      .toDF("age").select(Cleaning.binAge($"age")).as[String].collect()
    assert(got.toSeq ==
      Seq("0 - 23 months", "2 - 9", "40 - 49", "60 - 69", null, null))
  }

  test("hashId is deterministic and key-sensitive") {
    val df = Seq(("a", "b"), ("a", "b"), ("a", "c")).toDF("k1", "k2")
      .select(Ids.hashId($"k1", $"k2").as("id"))
    val ids = df.as[Long].collect()
    assert(ids(0) == ids(1) && ids(0) != ids(2))
  }

  test("wordShingles builds n-grams and empties short docs") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(Text.wordShingles(Text.tokens($"t"), 3).as("sh"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("spaceSaving: exact regime equals groupBy; approx bounds merge-order-proof") {
    import graft.plans.SketchAggregates
    val data = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(10)("c") ++ Seq.fill(5)("d")
    val ds = data.toDF("k").repartition(7) // forces partial-buffer merges
    // capacity >= distinct: no evictions in any partial, exact counts,
    // deterministic (cnt desc, term) output order.
    val exact = ds.agg(SketchAggregates.heavyHitters($"k", 10).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.term", $"h.cnt", $"h.err")
      .as[(String, Long, Long)].collect().toSeq
    assert(exact == Seq(("a", 60L, 0L), ("b", 25L, 0L),
      ("c", 10L, 0L), ("d", 5L, 0L)))
    // capacity 2 (approx regime): only order-invariant guarantees —
    // counts conserve, estimates bracket the truth, and any key with
    // true count > n/capacity (a: 60 > 50) survives.
    val approx = ds.agg(SketchAggregates.heavyHitters($"k", 2).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.term", $"h.cnt", $"h.err")
      .as[(String, Long, Long)].collect().toSeq
    assert(approx.size == 2)
    assert(approx.map(_._2).sum == 100L)
    val trueCounts = Map("a" -> 60L, "b" -> 25L, "c" -> 10L, "d" -> 5L)
    assert(approx.forall { case (t, c, e) =>
      val tc = trueCounts(t); c >= tc && c - e <= tc })
    assert(approx.map(_._1).contains("a"))
  }

  test("wordShingles kernel is byte-identical to the HOF form") {
    import graft.plans.TextKernels
    val texts = Seq("a b c d e", " leading and trailing  ", "\tTAB lead x y",
      "one two", "", "   ", "x\ny z\tw q", "solo")
    val df = texts.toDF("t")
    for (n <- Seq(2, 3)) {
      val got = df.select(TextKernels.wordShinglesNative($"t", n))
        .as[Seq[String]].collect().toSeq
      val want = df.select(Text.wordShingles(Text.tokens($"t"), n))
        .as[Seq[String]].collect().toSeq
      assert(got == want, s"n=$n: $got vs $want")
    }
  }

  test("countMin: estimates upper-bound truth, exact when wide, merge-invariant") {
    import graft.plans.SketchAggregates
    val data = (0L until 200L).flatMap(i => Seq.fill((i % 7).toInt + 1)(i % 20))
    val trueCounts = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def estimates(width: Int, parts: Int): Map[Long, Long] = {
      val ds = data.toDF("k").repartition(parts) // forces sketch merges
      val sk = ds.agg(SketchAggregates.countMin($"k", width).as("sk"))
      (0L until 20L).toDF("k").crossJoin(sk)
        .select($"k", SketchAggregates.cmEstimate($"sk", $"k", width).as("est"))
        .as[(Long, Long)].collect().toMap
    }
    // Wide sketch (no collisions among 20 keys): exact.
    assert(estimates(4096, 5) == trueCounts)
    // Narrow sketch: still an upper bound on every key.
    val narrow = estimates(8, 5)
    assert((0L until 20L).forall(k => narrow(k) >= trueCounts(k)))
    // Merge is a vector add: partitioning cannot change the sketch.
    assert(estimates(8, 1) == narrow && estimates(8, 13) == narrow)
  }

  test("countMin: huge and negative keys address valid buckets, update == probe") {
    import graft.plans.SketchAggregates
    // Keys where a_i * x overflows Long (>= ~8.4e9) used to produce a
    // negative bucket in update() (JVM % keeps the dividend sign) while
    // the pmod-based probe stayed non-negative — update threw or
    // mis-addressed. Both sides now reduce the key mod p first.
    val keys = Seq(9000000000L, Long.MaxValue, -5L, -9000000000L, 42L)
    val data = keys.flatMap(k => Seq.fill(3)(k))
    val width = 64
    val sk = data.toDF("k").repartition(3)
      .agg(SketchAggregates.countMin($"k", width).as("sk"))
    val est = keys.toDF("k").crossJoin(sk)
      .select($"k", SketchAggregates.cmEstimate($"sk", $"k", width).as("est"))
      .as[(Long, Long)].collect().toMap
    // Probe reads back at least the true count for every key — only
    // possible if update() wrote the same buckets the probe addresses.
    assert(keys.forall(k => est(k) >= 3L), s"estimates: $est")
    val total = sk.selectExpr("aggregate(sk, 0L, (a, x) -> a + x)")
      .as[Long].head()
    assert(total == data.size.toLong * SketchAggregates.CountMinCore.Depth)
  }

  test("redaction: email/phone/ipv4 masked, counts per pattern") {
    import graft.functions.Redaction
    val df = Seq(
      "mail a.b+c@x-corp.io or b@y.org, call 555-123-4567, host 192.168.1.10",
      "no pii here").toDF("t")
      .select(
        Redaction.redactAll($"t").as("r"),
        Redaction.matchCount($"t", Redaction.EmailPattern).as("e"),
        Redaction.matchCount($"t", Redaction.PhonePattern).as("p"),
        Redaction.matchCount($"t", Redaction.Ipv4Pattern).as("i"))
    val rows = df.as[(String, Int, Int, Int)].collect()
    assert(rows(0)._1 ==
      "mail [EMAIL] or [EMAIL], call [PHONE], host [IP]")
    assert((rows(0)._2, rows(0)._3, rows(0)._4) == ((2, 1, 1)))
    assert(rows(1) == (("no pii here", 0, 0, 0)))
  }

  test("repetitionStats: run-length fold matches hand counts") {
    // "a a a b b c": total 6, top run 3 (a), dup = 3 (a) + 2 (b) = 5.
    // "x y z": total 3, top 1, dup 0. "": tokens = [""], total 1, top 1.
    val df = Seq("a a b a b c", "x y z", "")
      .toDF("t").select(Text.repetitionStats(Text.tokens($"t")).as("r"))
    val got = df.select($"r.total", $"r.top", $"r.dup")
      .as[(Long, Long, Long)].collect()
    assert(got(0) == ((6L, 3L, 5L)))
    assert(got(1) == ((3L, 1L, 0L)))
    assert(got(2) == ((1L, 1L, 0L)))
  }

  test("repetitionStats kernel == HOF fold on the corpus (words and bigrams)") {
    import graft.plans.TextKernels
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val toks = Text.tokens($"text")
    val cmp = docs.select(
      Text.repetitionStats(toks).as("h1"),
      TextKernels.repetitionStatsNative($"text", 1).as("k1"),
      Text.repetitionStats(Text.wordShingles(toks, 2)).as("h2"),
      TextKernels.repetitionStatsNative($"text", 2).as("k2"))
    assert(cmp.filter($"h1" =!= $"k1" || $"h2" =!= $"k2").count() == 0)
  }

  test("jaccard on token arrays") {
    val df = Seq(("a b c", "b c d")).toDF("x", "y")
      .select(Text.jaccard(Text.tokens($"x"), Text.tokens($"y")).as("j"))
    assert(df.as[Double].head() == 0.5)
  }

  test("simhash16 equal texts collide, is in range") {
    val df = Seq("spark fast engine", "spark fast engine", "other words entirely")
      .toDF("t").select(Text.simhash16(Text.tokens($"t")).as("h"))
    val hs = df.as[Int].collect()
    assert(hs(0) == hs(1))
    assert(hs.forall(h => h >= 0 && h < 65536))
  }

  test("langIdByStopwords votes and tie-breaks alphabetically") {
    val markers = Map("en" -> Seq("the"), "es" -> Seq("el"), "de" -> Seq("der"))
    val df = Seq("the the el", "el", "nothing here").toDF("t")
      .select(Text.langIdByStopwords(Text.tokens($"t"), markers).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "es", "de"))
  }

  test("bagFingerprint is order/duplication-insensitive") {
    val df = Seq("b a a c", "c  b a").toDF("t").select(Text.bagFingerprint($"t").as("f"))
    val fs = df.as[String].collect()
    assert(fs(0) == fs(1))
  }

  test("dot native matches HOF fold bit-for-bit") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(0.5, 0.25, 2.0))).toDF("a", "b")
    val (nat, hof) = df
      .select(Vectors.dot($"a", $"b").as("n"), Vectors.dotHof($"a", $"b").as("h"))
      .as[(Double, Double)].head()
    assert(nat == hof && nat == 7.0)
  }

  test("native minhash kernel matches the HOF formulation byte-for-byte") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a b c",
      "short doc",   // < 3 tokens after shingling guard
      "  padded   whitespace   tokens   here   now  ")
    val df = texts.toDF("text")
    val hofSig = df.select(
      Text.minhashSignature(Text.wordShingles(Text.tokens($"text"), 3), 8).as("sig"))
      .as[Seq[String]].collect()
    val natSig = df.select(
      graft.plans.MinHashSignature.minhashSignatureNative($"text", 8, 3).as("sig"))
      .as[Seq[String]].collect()
    assert(natSig.toSeq == hofSig.toSeq)
    val hofBands = df
      .select(Text.minhashSignature(Text.wordShingles(Text.tokens($"text"), 3), 8).as("sig"))
      .where($"sig".isNotNull)
      .select(Text.lshBandKeys($"sig", 8, 2).as("b")).as[Seq[String]].collect()
    val natBands = df.select(
      graft.plans.MinHashSignature.minhashBandKeysNative($"text", 8, 2, 3).as("b"))
      .where($"b".isNotNull).as[Seq[String]].collect()
    assert(natBands.toSeq == hofBands.toSeq)
  }

  test("native simhash and winnowing kernels match HOF formulations") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a",
      "x",
      "")
    val df = texts.toDF("text")
    val sim = df.select(
      Text.simhash16(Text.tokens($"text")).as("hof"),
      graft.plans.TextKernels.simhash16Native($"text").as("nat"))
      .as[(Int, Int)].collect()
    assert(sim.forall { case (h, n) => h == n })
    val win = df.select(
      Text.winnowingFingerprints($"text", 5, 4).as("hof"),
      graft.plans.TextKernels.winnowingNative($"text", 5, 4).as("nat"))
      .as[(Seq[String], Seq[String])].collect()
    assert(win.forall { case (h, n) => h == n })
    val profiles = Map("en" -> Seq("the", "ing"), "de" -> Seq("der", "sch"))
    val lid = df.select(
      Text.langIdByCharNgrams($"text", profiles).as("hof"),
      graft.plans.TextKernels.langIdNative($"text", profiles).as("nat"))
      .as[(String, String)].collect()
    assert(lid.forall { case (h, n) => h == n })
  }

  test("graft kernels callable from SQL after registration") {
    graft.plans.GraftFunctions.register(spark)
    Seq(("a b c d e", Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("t", "va", "vb")
      .createOrReplaceTempView("kernel_probe")
    val row = spark.sql(
      """SELECT graft_dot(va, vb) AS d, graft_simhash16(t) AS sh,
         size(graft_minhash(t, 4, 3)) AS mk,
         size(graft_minhash_bands(t, 4, 2, 3)) AS mb,
         size(graft_winnowing(t, 3, 2)) AS wf
         FROM kernel_probe""").head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getInt(1) >= 0 && row.getInt(1) < 65536)
    assert(row.getInt(2) == 4 && row.getInt(3) == 2 && row.getInt(4) >= 1)
    val err = intercept[Exception](
      spark.sql("SELECT graft_minhash(t, t, 3) FROM kernel_probe").head())
    assert(err.getMessage.contains("integer literal") ||
      err.getMessage.toLowerCase.contains("literal"))
  }

  test("UnitHash kernel is bit-identical to the md5 hex-parse column idiom") {
    // The legacy idiom every sampling query used before the native
    // kernel: conv(substring(md5(key),1,8),16,10)/2^32. The kernel must
    // match it EXACTLY (same doubles) on arbitrary keys — it replaced
    // the idiom in q75/q175/q176/q230 under unchanged oracles.
    val keys = (0 until 500).map(i => s"key_${i}_${"x" * (i % 17)}") ++
      Seq("", "_", "0", "ümlaut-日本語", "a|b", "1_31")
    val df = keys.toDF("k").select(col("k"),
      graft.plans.TextKernels.unitHashNative(col("k")).as("native"),
      (expr("cast(conv(substring(md5(k), 1, 8), 16, 10) as double)") /
        lit(4294967296.0)).as("legacy"))
    val rows = df.collect()
    assert(rows.length == keys.length)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"mismatch for key=${r.getString(0)}")
    }
    // Range + null safety + SQL surface.
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) < 1.0))
    graft.plans.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT graft_unit_hash('key_1_x') AS u").head().getDouble(0)
    assert(viaSql == graft.plans.TextKernels.unitHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("key_1_x")))
    val nullRow = Seq[Option[String]](None).toDF("k")
      .select(graft.plans.TextKernels.unitHashNative(col("k"))).head()
    assert(nullRow.isNullAt(0))
  }

  test("cosine of identical vectors is 1") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(Vectors.cosine(Vectors.toDoubleVec($"a"), Vectors.toDoubleVec($"b")).as("c"))
    assert(math.abs(df.as[Double].head() - 1.0) < 1e-12)
  }
}
