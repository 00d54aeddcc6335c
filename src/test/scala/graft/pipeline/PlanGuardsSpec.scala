package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.functions._

/** [[PlanGuards]] must see THROUGH every node that hides plan fragments
  * from TreeNode traversal: adaptive wrappers, query stages, and — the
  * round-12 ADVICE hole — `ReusedExchangeExec`, a LeafExecNode whose
  * deduplicated exchange is a member, not a child. */
class PlanGuardsSpec extends SparkTestBase {

  test("reused exchange is visible exactly once (identity dedup)") {
    import spark.implicits._
    // A self-join over the same aggregated subquery plans two
    // structurally identical shuffles; the ReuseExchangeAndSubquery rule
    // (AQE off, so the reuse is deterministic in the static plan)
    // replaces the second with a ReusedExchangeExec. There is ONE real
    // shuffle write: flatten must expose the wrapped exchange (else a
    // plan whose only shuffle sits behind the reuse reference reads as
    // shuffle-free) and shuffleCount must not double-count it.
    val aqeKey = "spark.sql.adaptive.enabled"
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val (aqe0, bc0) = (spark.conf.get(aqeKey), spark.conf.get(bcKey))
    spark.conf.set(aqeKey, "false")
    spark.conf.set(bcKey, "-1") // keep the join SMJ so both sides sort-shuffle-free post-agg
    try {
      val agg = (1L to 200L).map(i => (i % 7, i)).toDF("k", "v")
        .groupBy($"k").agg(sum($"v").as("s"))
      val joined = agg.as("x").join(agg.as("y"), "k")
      joined.collect()
      val nodes = PlanGuards.flatten(joined.queryExecution.executedPlan)
      val reused = nodes.collect { case r: ReusedExchangeExec => r }
      assert(reused.nonEmpty, "expected the planner to reuse the " +
        s"identical aggregate exchange:\n${joined.queryExecution.executedPlan}")
      // the wrapped exchange is reachable through the reuse reference
      val viaReuse = reused.flatMap(r => PlanGuards.flatten(r.child))
        .collect { case s: ShuffleExchangeLike => s }
      assert(viaReuse.nonEmpty, "flatten must descend into ReusedExchangeExec")
      assert(PlanGuards.shuffleCount(joined.queryExecution.executedPlan) == 1,
        "one real shuffle write: not hidden by the reuse wrapper, not " +
          "double-counted through it")
    } finally {
      spark.conf.set(aqeKey, aqe0)
      spark.conf.set(bcKey, bc0)
    }
  }
}
