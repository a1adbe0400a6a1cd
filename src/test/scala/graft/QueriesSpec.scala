package graft

class QueriesSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and oracle keys line up") {
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sfDir).columns.length
    }
    assert(results.values.forall(_ > 0))
    // every oracle has a query; queries without oracle are the documented
    // approximate ones
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // EVERY query is exactly oracled — including the sketches (q59 emits
    // an exact statistic + error-bound flags rather than raw
    // engine-specific sketch values) and the LSH/IVF ANN queries
    // (deterministic hyperplanes/centroids).
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  test("q123 BM25 matches an in-memory reference") {
    // Independent recomputation of the whole BM25 pipeline (tokenize,
    // tf/df/dl/avgdl, 6-dp component grid, term-ordered fold, top-10)
    // mirroring the query's determinism contract exactly.
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val qTerms = Seq("merge", "spark", "window") // term-sorted fold order
    def r(x: Double, n: Int): Double =
      BigDecimal.valueOf(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val nDocs = toks.size
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / nDocs
    val dl = toks.map { case (id, w) => id -> w.size }.toMap
    val tf = toks
      .flatMap { case (id, w) => w.filter(qTerms.contains).map((id, _)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.size }
    val df = tf.keySet.groupBy(_._2).map { case (t, xs) => t -> xs.size }
    val want = tf.keySet.map(_._1).toSeq.sorted.map { id =>
      val score = qTerms.flatMap { t =>
        tf.get((id, t)).map { n =>
          val idf = math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
          r(idf * (n * 2.2) / (n + 1.2 * (0.25 + 0.75 * dl(id) / avgdl)), 6)
        }
      }.foldLeft(0.0)(_ + _)
      // unrounded final score (roundlint r11): only the TERMS stay on
      // the 6-dp grid; the fold sum is emitted exactly
      id -> score
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = SparkEntry.queries("q123_bm25")(spark, sfDir)
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("q125 perplexity filter matches an in-memory unigram LM") {
    import spark.implicits._
    def r(x: Double, n: Int): Double =
      BigDecimal.valueOf(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val cnt = toks.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val total = cnt.values.map(_.toLong).sum
    val lp = cnt.map { case (t, c) => t -> r(-math.log(c.toDouble / total), 6) }
    val want = toks.map { case (id, w) =>
      val nll = w.map(lp).foldLeft(0.0)(_ + _) // position order
      // unrounded avg (roundlint r11): the fold sum / count is exact
      (id, w.size.toLong, nll / w.size, nll / w.size <= 3.45)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q125_perplexity_filter")(spark, sfDir)
      .orderBy("doc_id").as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == want)
    assert(want.exists(_._4) && want.exists(!_._4)) // the threshold splits
  }

  test("q126 PMI collocations match an in-memory reference") {
    import spark.implicits._
    def r(x: Double, n: Int): Double =
      BigDecimal.valueOf(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val toks = docs.map { case (_, t) => t.trim.split("\\s+").toSeq }
    val uni = toks.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val bi = toks.flatMap(w => w.zip(w.drop(1)).map { case (a, b) => s"$a $b" })
      .groupBy(identity).map { case (g, xs) => g -> xs.size }
    val totU = uni.values.map(_.toLong).sum.toDouble
    val totB = bi.values.map(_.toLong).sum.toDouble
    val want = bi.toSeq.filter(_._2 >= 5).map { case (g, cab) =>
      val Array(a, b) = g.split(" ")
      (g, cab.toLong,
        r(math.log((cab / totB) / ((uni(a) / totU) * (uni(b) / totU))), 4))
    }.sortBy { case (g, _, p) => (-p, g) }.take(20)
    val got = SparkEntry.queries("q126_pmi_collocations")(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == want)
  }
}
