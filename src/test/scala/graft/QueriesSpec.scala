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
    // q59 only: HLL/quantile sketch values are engine-specific, so it gets
    // the driver's weaker rows-only check. Everything else (including the
    // LSH/IVF ANN queries — deterministic hyperplanes/centroids) is
    // exactly oracled.
    assert(noOracle == Set("q59_sketches"))
  }
}
