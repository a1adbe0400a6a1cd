package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GraftGuards

/** Runtime plan-governance guard: the opt-in optimizer rule that fails
  * unpartitioned windows over unbounded inputs (GraftGuards scaladoc).
  * Flag hygiene matters — every case restores the default so the shared
  * session never leaks guard state into other suites.
  */
class GuardSpec extends SparkSpec {

  private def withFlag[A](on: Boolean)(body: => A): A = {
    GraftGuards.install(spark)
    spark.conf.set(GraftGuards.FlagKey, on.toString)
    try body finally spark.conf.unset(GraftGuards.FlagKey)
  }

  test("flag off: the guard observes nothing and q200's exact face runs") {
    withFlag(on = false) {
      assert(SparkEntry.queries("q200_pareto_revenue")(spark, sfDir).count() > 0)
    }
  }

  test("flag on: q200's global cumulative window is refused with a named window") {
    withFlag(on = true) {
      val e = intercept[Exception] {
        SparkEntry.queries("q200_pareto_revenue")(spark, sfDir).collect()
      }
      // The guard throws from inside planning; depending on the action
      // path Spark may wrap it — match on the tagged message.
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("[graft-guard]")),
        s"expected the guard's tagged refusal, got: $e")
    }
  }

  test("flag on: the banded rewrite and a post-limit bounded window stay legal") {
    withFlag(on = true) {
      // q203 is the ScalableWindow rewrite of q200 — zero unpartitioned
      // windows, must pass under the guard.
      assert(SparkEntry.queries("q203_pareto_scaled")(spark, sfDir).count() > 0)
      // A global window over a LIMIT-bounded input carries maxRows and
      // is harmless by construction — the guard must not refuse it.
      val bounded = Tables.load(spark, sfDir, "nation").limit(10)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("n_nationkey"))))
      assert(bounded.count() == 10)
    }
  }
}
