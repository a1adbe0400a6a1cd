package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for the graft kernels, so `spark.sql` users
  * call them directly (`SELECT graft_simhash16(text) …`). Two entry
  * points:
  *
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *    (the SparkSessionExtensions route for clusters/config files);
  *  - [[GraftFunctions.register]] on a live session (tests, notebooks).
  *
  * Int parameters (k, bands, w) are taken as literal arguments and bound
  * at resolution time — the kernels stay whole-stage-codegen scalar
  * expressions, not UDFs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(e.injectFunction)
    // Plan governance (no-op unless spark.graft.failOnGlobalWindow=true).
    e.injectOptimizerRule(_ => GraftGuards.GlobalWindowGuard)
  }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans.GraftFunctions", null, name, usage, "")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    (FunctionIdentifier("graft_simhash16"),
      info("graft_simhash16", "graft_simhash16(text) - 16-bit SimHash over tokens"),
      (es: Seq[Expression]) => SimHash16(es.head)),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(text, k, n) - k-wide MinHash signature"),
      (es: Seq[Expression]) =>
        MinHashSignature(es.head, intArg(es(1), "k"), intArg(es(2), "n"))),
    (FunctionIdentifier("graft_minhash_bands"),
      info("graft_minhash_bands",
        "graft_minhash_bands(text, k, bands, n) - LSH band keys"),
      (es: Seq[Expression]) => MinHashBandKeys(
        es.head, intArg(es(1), "k"), intArg(es(2), "bands"), intArg(es(3), "n"))),
    (FunctionIdentifier("graft_winnowing"),
      info("graft_winnowing",
        "graft_winnowing(text, k, w) - winnowing fingerprints"),
      (es: Seq[Expression]) => WinnowingFingerprints(
        es.head, intArg(es(1), "k"), intArg(es(2), "w"))),
    (FunctionIdentifier("graft_count_min"),
      info("graft_count_min",
        "graft_count_min(key, width) - count-min sketch counters (agg)"),
      (es: Seq[Expression]) =>
        SketchAggregates.CountMin(es.head, intArg(es(1), "width"))),
    (FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity (0.7 gate, 0.1 prefix scale)"),
      (es: Seq[Expression]) => JaroWinkler(es(0), es(1))),
    (FunctionIdentifier("graft_damerau"),
      info("graft_damerau",
        "graft_damerau(a, b) - true Damerau-Levenshtein distance (adjacent transpositions cost 1)"),
      (es: Seq[Expression]) => DamerauLevenshtein(es(0), es(1))),
    (FunctionIdentifier("graft_lcp"),
      info("graft_lcp",
        "graft_lcp(a, b) - longest-common-prefix length in UTF-16 code units"),
      (es: Seq[Expression]) => CommonPrefixLen(es(0), es(1))),
    (FunctionIdentifier("graft_unit_hash"),
      info("graft_unit_hash",
        "graft_unit_hash(key) - deterministic md5 unit-interval hash in [0,1)"),
      (es: Seq[Expression]) => UnitHash(es.head)),
    (FunctionIdentifier("graft_geohash"),
      info("graft_geohash",
        "graft_geohash(lat, lon, chars) - geohash cell id (5*chars bits)"),
      (es: Seq[Expression]) =>
        graft.spatial.GeohashCell(es(0), es(1), intArg(es(2), "chars"))))

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
