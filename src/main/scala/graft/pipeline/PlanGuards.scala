package graft.pipeline

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

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

  /** Every node of the executed plan, INCLUDING adaptive-wrapper,
    * query-stage, and reused-exchange bodies. `ReusedExchangeExec` is a
    * LeafExecNode whose wrapped exchange is a member, not a child — the
    * same invisibility trap as the query stages, so it is expanded too
    * (a plan whose only shuffle is deduplicated via exchange reuse must
    * still count as shuffling). A node reachable through BOTH the reuse
    * reference and its original site appears twice here; identity-based
    * consumers ([[shuffleCount]]) dedup, existence checks don't care. */
  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Number of DISTINCT shuffle exchanges actually present in the
    * executed plan. Deduped by object identity, not structural equality:
    * a reused exchange resolves to the same runtime instance (one
    * shuffle write), while two structurally identical but separate
    * exchanges are two real shuffles and must count as two. */
  def shuffleCount(p: SparkPlan): Int = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    flatten(p).foreach {
      case s: ShuffleExchangeLike => seen.add(s)
      case _ => ()
    }
    seen.size
  }
}
