package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Plan-shape guardrails for the round-7 operator cohort: the scale
  * arguments in each query's Scaladoc are structural claims about the
  * physical plan — pin them so a refactor (or an optimizer change) that
  * silently reintroduces an all-pairs join or a data-sized shuffle fails
  * a test, not a production run. Queries whose plans legitimately carry a
  * broadcast single-row dimension (point estimates, horizons, totals) are
  * only asserted Cartesian-free; the rest must be free of any nested-loop
  * join at all. */
class Round7PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("no round-7 gate plans a CartesianProduct") {
    for (q <- Seq("q234_ndcg_mrr", "q235_rank_biased_overlap",
        "q236_adamic_adar", "q237_kaplan_meier", "q238_bootstrap_ci",
        "q240_segmented_trend", "q241_postings_size",
        "q242_apriori_triples", "q243_seasonal_anomaly",
        "q244_lsh_quality", "q245_bpe_encode_multi",
        "q246_poisson_bootstrap", "q250_weighted_sssp",
        "q251_diff_in_diff", "q252_clustering_coeff", "q253_hits",
        "q254_temporal_reach")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
    }
  }

  test("candidate-generation gates never fall back to nested-loop joins") {
    // these have NO single-row broadcast dims: any nested-loop join means
    // a candidate step went all-pairs (q244 is excluded — its OUTPUT row
    // is three 1-row count aggregates cross-joined; its candidate kernels
    // are the already-guarded q26/q27 ones)
    for (q <- Seq("q234_ndcg_mrr", "q235_rank_biased_overlap",
        "q236_adamic_adar", "q241_postings_size", "q242_apriori_triples")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q planned a nested-loop join:\n$p")
    }
  }

  test("the Poisson bootstrap is join-free (its whole point)") {
    val p = plan("q246_poisson_bootstrap")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("BroadcastHashJoin"),
      s"q246 must not probe anything — weights are computed inline:\n$p")
  }
}
