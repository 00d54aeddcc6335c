package graft.pipeline

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Structural assertions over EXECUTED plans.
  *
  * Under AQE a bare `plan.collect { case s: ShuffleExchangeExec => s }`
  * is VACUOUS: every materialized exchange is wrapped in a
  * `ShuffleQueryStageExec` (and the whole final plan in a result query
  * stage), both `LeafExecNode`s whose `plan` member TreeNode traversal
  * never descends into — so the collect sees nothing and a guard built
  * on it can never fire (caught by the round-11 self-review; the q360
  * gate and BucketingSpec both had it). [[flatten]] expands query-stage
  * bodies and the adaptive wrapper so counts mean what they say. */
object PlanGuards {

  /** Every node of the executed plan, INCLUDING adaptive-wrapper and
    * query-stage bodies. */
  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Number of shuffle exchanges actually present in the executed plan
    * (each materialized stage's exchange counted once). */
  def shuffleCount(p: SparkPlan): Int =
    flatten(p).count {
      case _: ShuffleExchangeLike => true
      case _ => false
    }
}
