package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Deep physical-plan traversal for plan-shape assertions: descends
  * into AQE query stages (whose subtrees are NOT in `children`),
  * reused exchanges, and expression subqueries (where DPP filters
  * live). */
object PlanWalk {
  def deepCollect[A](p: SparkPlan)(pf: PartialFunction[SparkPlan, A]): Seq[A] = {
    val nested: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    }
    pf.lift(p).toSeq ++ (p.children ++ nested ++ p.subqueries).flatMap(deepCollect(_)(pf))
  }
}
