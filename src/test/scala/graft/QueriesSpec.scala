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
}
