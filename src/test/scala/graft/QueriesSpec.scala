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
    // q39: approximate ANN; q59: engine-specific sketch values — both get
    // the driver's weaker rows-only check.
    assert(noOracle == Set("q39_lsh_ann", "q59_sketches"))
  }
}
