package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Runtime plan governance — the PlanSpec discipline shipped as an
  * optimizer `Rule[LogicalPlan]` (extension-ladder tier c's missing
  * rung: the engine already has a custom LogicalPlan + Strategy +
  * physical operator in TopKPerKey; this adds the Rule face).
  *
  * The single most expensive silent mistake in a 100 TB deployment is
  * `Window.orderBy(...)` with no partition spec: every row moves
  * through ONE task (the q200/q182 finding — fine at sf0.1, fatal at
  * scale). Specs catch the engine's own queries; this guard covers
  * USER queries at runtime:
  *
  *  - `spark.graft.failOnGlobalWindow=true` → planning a Window with an
  *    EMPTY partition spec over an input whose row bound is unknown
  *    (`child.maxRows.isEmpty`) throws with the offending window
  *    printed. Post-`limit` windows (50-row tails, top-k heads) carry a
  *    known `maxRows` and stay legal — bounded global windows are
  *    harmless by construction.
  *  - flag absent/false → the rule is a no-op (default: observe
  *    nothing, cost nothing).
  *
  * The rule only INSPECTS — it never rewrites — so it cannot change any
  * query result (GuardSpec proves q203 and a post-limit window still
  * run with the flag on, and q200's exact face throws only then).
  */
object GraftGuards {

  val FlagKey = "spark.graft.failOnGlobalWindow"

  object GlobalWindowGuard extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (conf.getConfString(FlagKey, "false").toBoolean) {
        plan.foreach {
          case w: Window if w.partitionSpec.isEmpty && w.child.maxRows.isEmpty =>
            throw new IllegalStateException(
              s"[graft-guard] unpartitioned Window over an unbounded input " +
                s"(single-task at scale; partition it, band it with " +
                s"ScalableWindow, or bound it with limit): " +
                w.windowExpressions.mkString(", "))
          case _ => ()
        }
      }
      plan
    }
  }

  /** Install on a live session (idempotent) — the
    * `TopKPerKey.ensureStrategy` pattern for optimizer rules.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(GlobalWindowGuard))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GlobalWindowGuard
}
