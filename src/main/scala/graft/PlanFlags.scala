package graft

import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec,
  SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** The two physical-plan shapes that do not survive 100 TB, detected on the
  * pre-AQE plan — single-sourced so the PLANS.md audit ([[ExplainAudit]])
  * and the per-query regression test (PlanAuditSpec) flag identically:
  *
  *  - `CARTESIAN`: a CartesianProductExec anywhere (broadcast nested-loop
  *    joins against bounded sides are fine and intentionally not flagged);
  *  - `GLOBAL-WINDOW`: a WindowExec with an empty partition spec whose
  *    input is NOT limit-bounded — a single-partition pass over the whole
  *    dataset. A global window over a top-k-limited subtree is constant
  *    size at any scale and allowed.
  */
object PlanFlags {

  private def limitBounded(p: SparkPlan): Boolean =
    p.exists {
      case _: GlobalLimitExec => true
      case _: TakeOrderedAndProjectExec => true
      case _: CollectLimitExec => true
      case _ => false
    }

  /** Red flags for a pre-AQE physical plan; empty = scale-shape clean. */
  def flags(plan: SparkPlan): Seq[String] = {
    val cartesian = plan.collect { case c: CartesianProductExec => c }.size
    val globalWindows = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty && !limitBounded(w.child) => w
    }.size
    Seq(
      if (cartesian > 0) Some("CARTESIAN") else None,
      if (globalWindows > 0) Some("GLOBAL-WINDOW") else None).flatten
  }
}
