package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Round-8 plan-shape guardrails. The round's headline structural claim:
  * the engine no longer contains ANY in-gate unpartitioned window over a
  * data-sized frame — q238's bootstrap row index (the last one) now goes
  * through DistributedScan.rowNumbers. Pin that the way
  * DistributedScanSpec pins the operator itself: every partition-less
  * Window in q238's optimized plan must sit over an Aggregate (the
  * |partitions|-row offsets scan, or the 40-row replicate-means ranking —
  * both constant-size by construction), never over the scanned data. */
class Round8PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q238 plans no unpartitioned window over a data-sized frame") {
    val plan = SparkEntry.queries("q238_bootstrap_ci")(spark, dir)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    var checked = 0
    plan.foreach {
      case w: LW if w.partitionSpec.isEmpty =>
        def isAggChild(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
          p.isInstanceOf[Aggregate] || (p.children.size == 1 && isAggChild(p.children.head))
        assert(isAggChild(w.child),
          s"unpartitioned Window over non-aggregate input:\n$w")
        checked += 1
      case _ =>
    }
    // the offsets window must actually be in the plan (guards against the
    // assertion silently passing because rowNumbers was dropped entirely)
    assert(checked >= 1, "expected at least one (bounded) offsets window")
  }

  test("q238's draw join and index scan stay shuffle-joined, never cartesian") {
    val p = SparkEntry.queries("q238_bootstrap_ci")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"q238 went cartesian:\n$p")
  }

  test("q171's ntile is rank arithmetic — no unpartitioned data-sized window") {
    // the global ntile was the audit's one real flag (graft.tools
    // .WindowAudit scans all 296 optimized plans; 0 flags since this
    // rewrite): deciles now derive from DistributedScan.rowNumbers ranks
    val hits = graft.tools.WindowAudit.unpartitionedDataWindows(
      SparkEntry.queries("q171_ntile_deciles")(spark, dir)
        .queryExecution.optimizedPlan)
    assert(hits.isEmpty, hits.mkString("; "))
  }
}
