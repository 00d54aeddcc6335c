package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Plan-shape guardrails for the round-10 session-2 cohort (q346–q351):
  * each gate's Scaladoc makes structural claims about the physical plan
  * (model joins broadcast, anti-join present, ON-clause filter pushed to
  * the scan, window-only self-BLEU) — pin them so a refactor or
  * optimizer change that silently degrades the shape fails a test.
  * q345 is excluded: its output frame is the driver-built trajectory
  * table (LocalTableScan by construction); its per-round shapes are the
  * q330 segmentation projection + grouped count already asserted by the
  * engine-wide audits. */
class Session2PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("no session-2 gate plans a CartesianProduct") {
    for (q <- Seq("q346_perplexity_buckets", "q347_temperature_mixing",
        "q348_self_bleu", "q349_order_count_dist", "q350_dormant_rich",
        "q351_sq8_quantize")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
    }
  }

  test("q346: the LM is a broadcast dimension (hot-token shuffle skew never materializes)") {
    val p = plan("q346_perplexity_buckets")
    assert(p.contains("BroadcastHashJoin"), s"lm join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token-keyed sort-merge join appeared:\n$p")
  }

  test("q347: the quota table broadcasts onto the corpus") {
    val p = plan("q347_temperature_mixing")
    assert(p.contains("BroadcastHashJoin"), s"alloc join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-sized sort-merge join appeared:\n$p")
  }

  test("q348: self-BLEU is JOIN-FREE — the top-2 window pass replaces the per-doc anti-join") {
    val p = plan("q348_self_bleu")
    assert(!p.contains("Join"), s"q348 must not join anything:\n$p")
  }

  test("q349: the ON-clause priority filter reaches the orders scan") {
    // the non-preserved side of a LEFT join admits pushdown; the filter
    // must land in the parquet scan's PushedFilters, not evaluate post-join
    val p = plan("q349_order_count_dist")
    assert(p.contains("PushedFilters") && p.contains("o_orderpriority"),
      s"ON-clause filter not pushed to the scan:\n$p")
  }

  test("q350: the NOT EXISTS arm plans as an anti-join; the stats row is the only nested-loop") {
    val p = plan("q350_dormant_rich")
    assert(p.contains("LeftAnti"), s"anti-join missing:\n$p")
    // the 1-row stats broadcast is the one legitimate nested-loop; a
    // second one would mean a data-sized candidate step went all-pairs
    val nl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nl <= 1, s"expected at most the 1-row stats nested-loop, got $nl:\n$p")
  }

  test("q351: the 64-row calibration model broadcasts; no corpus-sized sort-merge join") {
    val p = plan("q351_sq8_quantize")
    assert(p.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"cell-stream sort-merge join appeared:\n$p")
  }
}
