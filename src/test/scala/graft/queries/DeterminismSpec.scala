package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Results must be invariant to parallelism: the same query run with
  * different shuffle-partition counts and scan-split sizes must produce
  * identical rows. This is the local proxy for "the answer doesn't change
  * on a 1000-executor cluster" — any order-dependent float accumulation or
  * arbitrary-survivor leak shows up here.
  */
class DeterminismSpec extends SparkTestBase {

  // mix of shapes: decimal agg, framed window, sessionization, shingle
  // join, minhash banding, simhash NN kernel, knn kernel, stats moments
  private val probes = Seq(
    "q01_pricing_summary", "q06_rolling_window", "q21_sessionize",
    "q26_ngram_jaccard", "q27_minhash_lsh", "q28_simhash",
    "q29_knn_cosine", "q52_stats_aggregates", "q59_ann_ivf",
    "q60_hash_split", "q61_tfidf_topk", "q63_decontamination", "q65_crossmodal_agreement", "q67_connected_components",
    "q74_scd2_history", "q77_skew_salted_join", "q78_bm25_topk",
    "q79_chunk_dedup", "q81_hll_sketch_merge", "q82_incremental_agg",
    "q84_outlier_zscore", "q85_ewma", "q86_fuzzy_name_join",
    "q87_bloom_pruned_join", "q88_cms_heavy_hitters",
    // scan-derived family: the distributed prefix sum repartitions by
    // RANGE internally, so these probe that boundary placement (which
    // legitimately varies with parallelism) never reaches the answer
    "q114_ks_test", "q115_mannwhitney_u", "q120_spearman", "q132_gini",
    "q134_weighted_median", "q136_quantile_normalize",
    // decimal power sums, fixed-point kernels, recursive CTE
    "q125_centroid_cosine", "q139_higher_moments", "q121_bigram_lm_score",
    "q138_recursive_cte",
    // corpus-model family: decimal k-means distances/centroids, global
    // token stats attached via broadcast, integer-exact pair counts
    "q142_kmeans_assign", "q143_token_rarity", "q144_bpe_pairs",
    "q145_mixture_reweight",
    // prefix-filtered similarity join + composed selection/audit gates
    "q146_prefix_jaccard", "q147_cluster_balanced", "q148_split_leakage",
    "q149_epoch_shuffle", "q150_shard_manifest",
    // curation batch: within-cluster cosine anti-join, span-key hash agg,
    // first-occurrence prefix sums, 6-table broadcast-armed join
    "q151_semdedup", "q152_span_mining", "q153_vocab_growth",
    "q154_local_supplier", "q155_multiset_ops", "q156_seasonal_index",
    "q157_bit_aggs", "q158_listagg", "q159_exact_percentiles",
    "q160_linear_probe", "q161_below_avg_lots", "q162_group_by_all",
    "q163_positional_window", "q164_union_by_name", "q165_regexp_family",
    // profiling family: regression moment sketches, bucket arithmetic,
    // TRY_CAST branches, ntile deciles, dense_rank distinct rewrite
    "q166_regr_family", "q167_width_bucket", "q168_try_cast",
    "q169_pii_mask", "q170_calendar_functions", "q171_ntile_deciles",
    "q172_window_distinct", "q173_multi_distinct", "q174_null_ordering",
    "q175_ilike",
    // behavioral-analytics batch: windowed RSI, basket self-join + top-k
    // cut, hash-split proportions, censored hazard prefix sums, clamped
    // running balance (reflection identity over two windows)
    "q178_rsi", "q179_market_basket", "q180_ab_ztest", "q182_cum_hazard",
    "q183_capped_balance",
    // SQL-breadth batch: pinned-tie-break mode, FILTER-clause aggregates,
    // Q21-shaped one-pass fault aggregate, integer largest-remainder
    // allocation, LOCF-kernel last-touch attribution
    "q184_mode_pinned", "q185_filter_clause", "q186_only_late_supplier",
    "q187_largest_remainder", "q188_attribution",
    // finance/monitoring batch: CUSUM reflection windows, arg-max day-end
    // roll-up, lead-windowed TWAP weights, bridge decimal term sums
    "q189_cusum_alarm", "q190_eod_balance", "q191_twap",
    "q192_price_volume_bridge",
    // SQL-surface batch: native session_window assembly, ordered-set
    // aggregates, TRY-arithmetic NULL paths
    "q193_session_window", "q194_ordered_set_aggs", "q195_try_arithmetic",
    "q196_topk_with_ties", "q197_posexplode_firstpos",
    "q198_market_share", "q199_log2_histogram",
    "q200_interval_coverage", "q201_model_auc", "q202_null_safe_join",
    "q203_crossdup_matrix",
    // curation-ops batch: candidate-pruned RRF ranks, one-pass kappa
    // contingency, md5-digest DISTINCTs, funnel over the minhash path
    "q205_rrf_fusion", "q206_cohens_kappa", "q207_text_normalize",
    "q208_curation_funnel",
    // round-8 closers: coalition-cell Shapley, interpreted JL kernel,
    // distributed-scan rank alignment, decimal-pinned NB log-space argmax
    "q299_shapley_attribution", "q300_jl_projection",
    "q301_quantile_match", "q302_naive_bayes", "q303_random_walks",
    "q304_retraction_view", "q305_louvain_phase1")

  private val dir = "/root/testdata/sf0.001"

  private def runWith(shufflePartitions: Int, maxPartitionBytes: String,
                      name: String): Seq[String] = {
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    val prevMb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevSp)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMb)
    }
  }

  probes.foreach { name =>
    test(s"$name is invariant to partitioning") {
      val a = runWith(shufflePartitions = 2, maxPartitionBytes = "134217728", name)
      val b = runWith(shufflePartitions = 13, maxPartitionBytes = "65536", name)
      assert(a.nonEmpty)
      assert(a == b, s"$name differs across parallelism configs")
    }
  }
}
