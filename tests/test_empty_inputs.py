"""Totality on EMPTY inputs: empty partitions/filters are routine at
scale and Ray blocks lose their schema when zero-row — every query must
return a typed (possibly empty) result, never crash.  A full sweep of
all 171 table queries over the empty fixture passes (2026-08 session
log); this module pins the 16 that once crashed plus representatives of
each shape family, so the guard paths stay covered without paying the
full sweep per CI run."""
import importlib.util
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        s = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(s.empty_table(), str(dst / f"{t}.parquet"))
    return str(dst)


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_mod_empty", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


QUERIES = [
    # the 16 once-broken ones
    "ann_recall_report", "ann_topk", "ann_topk_filtered", "ann_topk_ivf",
    "ann_topk_lsh", "ann_topk_pq", "doc_cube", "doc_grouping_sets",
    "doc_pagerank", "doc_rollup", "embedding_pca", "lang_pivot",
    "market_share", "mixture_sample", "quality_classifier",
    "weighted_sample",
    # shape-family representatives
    "exact_dedup", "asof_join", "sessionize", "tpch_q1",
    "revenue_by_nation", "dup_clusters", "heavy_hitters",
    "mannwhitney_chars", "order_total_audit", "pmi_pairs",
    "user_value_integral", "weighted_median_price",
    # round-3 late wave: range lookup, global rank, WOE, target
    # encoding, Kendall pair counts, JSONL roundtrip
    "price_band_orders", "global_doc_rank", "quantity_woe",
    "lang_target_encoding", "user_value_kendall", "jsonl_roundtrip",
    # round-3 continuation wave: windowed EWMA / spikes, transition
    # entropy, degree histogram, nearest as-of, readability, gapfill
    "user_value_ewma", "rolling_spikes", "transition_entropy",
    "degree_histogram", "asof_join_nearest", "readability_scores",
    "events_hourly_gapfill", "lang_source_mi", "key_skew_report",
    # round-3 continuation wave 5: EMD, rank-AUC, SCD2 islands,
    # activity coverage, common-neighbor link prediction
    "emd_chars", "score_auc", "scd2_intervals", "user_active_time",
    "link_common_neighbors",
    # wave 6: HITS, GROUPS frame, PAVA, JSD, Wilson CI
    "hits_scores", "peer_window_sums", "isotonic_calibration",
    "source_jsd", "lang_share_ci",
    # wave 7: LOCF resample, Fano burstiness, tolerance as-of
    "user_value_locf", "user_burstiness", "asof_join_tolerance",
    # wave 8: reflection-identity balance, sequence motifs
    "running_balance", "sequence_motifs",
    # wave 9: quantile mapping, k-anonymity, salting plan, KMV sketch
    "quantile_map_sources", "k_anonymity_audit", "salting_plan",
    "kmv_distinct_users", "bucket_merkle_diff", "wet_roundtrip",
    "psi_chars_drift", "nfc_audit", "orders_by_isoweek",
    "ols2_by_source", "changepoint_by_user", "max_drawdown_by_user",
    # wave 11: rank/runs/mode/gap statistics, lexical Gram ops
    "chars_token_spearman", "runs_test_by_user", "peak_hour_by_user",
    "type_switch_rate", "event_gap_quantiles", "hapax_rate_by_source",
    "source_bow_gram", "levene_absdev_chars",
    # wave 12: entropy, reorder, cross-table corr, argmax word, firsts
    "user_type_entropy", "reorder_rate", "spend_activity_corr",
    "top_word_per_source", "first_event_type_counts",
    # wave 13: autocorr, transitions, vocab jaccard, HHI, edit dist
    "user_value_autocorr", "type_transitions", "source_vocab_jaccard",
    "nation_revenue_hhi", "adjacent_edit_distance",
    # wave 14: activity analytics, pareto, dup-rate, histogram
    "dau_stickiness", "retention_cohorts", "nation_pareto80",
    "source_dup_rate", "chars_histogram",
    # wave 15: profiler, pagination, lift, char classes
    "orders_profile", "orders_topk_offset", "copurchase_lift",
    "char_class_profile",
    # wave 16: embedding audit, LCP template detector, lifespans
    "embedding_quant_stats", "source_lcp", "user_lifespan_hist",
    # recovered shadowed ops (renamed)
    "chars_width_histogram", "retention_cohorts_cal", "orders_profile_long",
    # wave 17: ANOVA F, Cramer's V, Theil, class weights, OHLC,
    # systematic sample, centroid cosine, FK orphans
    "anova_f_chars", "cramers_v", "nation_theil", "class_weight_plan",
    "user_daily_ohlc", "systematic_sample", "label_centroid_cosine",
    "fk_orphans",
    # wave 18: survival, KMV overlap, calibration
    "user_survival_km", "kmv_type_overlap", "langid_calibration",
    # wave 19: interpolation resample, z-order layout, gini split
    "user_value_interp", "zorder_layout", "best_split_chars",
    # wave 20: NB classifier, Markov stationary, AMS F2, zone maps,
    # jackknife
    "nb_lang_confusion", "event_type_stationary", "ams_f2_users",
    "zonemap_prune", "jackknife_mean_chars",
    # wave 21: busdays, feature table, MMR, permutation test, GDPR,
    # IVM merge
    "business_days_latency", "customer_feature_table", "mmr_select",
    "hash_permutation_test", "gdpr_erasure_audit", "ivm_delta_merge",
    # wave 22: trade SSSP, quota apportionment, hierarchy shares
    "trade_distance", "quota_allocation", "hierarchy_share",
    # wave 23: expectations, hypothetical rank, quantized pair dot
    "expectations_audit", "hypothetical_rank", "embedding_pair_dot",
    # wave 24: lag xcorr, ANALYZE stats, key-gap audit
    "type_lag_xcorr", "analyze_table_sketch", "sequence_gaps",
    # wave 25: dwell time, YoY revenue, dim profile
    "type_dwell_time", "yoy_revenue", "embedding_dim_profile",
    # wave 26: contrastive pairs, encoding advisor, decay score
    "contrastive_pairs", "encoding_advisor", "decay_score",
    # wave 27: hashing trick, SNM blocking, label propagation
    "feature_hashing_stats", "snm_dup_candidates",
    "label_propagation_langs",
    # wave 28: kappa, consistent hashing, RRF fusion
    "lang_kappa", "consistent_hash_balance", "rrf_fusion",
    # wave 29: churn jaccard, growth curve, compressibility
    "dau_churn_jaccard", "user_growth_curve",
    "compress_ratio_by_source",
    # wave 30: join-size estimate, conformal interval, Markov backtest
    "join_size_estimate", "conformal_chars_interval",
    "markov_next_accuracy",
    # wave 31: linear attribution, diff-in-diff, RBO
    "linear_attribution", "diff_in_diff", "rbo_rankings",
    # wave 32: curriculum, negative sampling, last-3 snapshot
    "curriculum_order", "negative_sampling_table", "user_last3_types",
    # wave 33: Theil-Sen, candidate keys, greedy set cover
    "theil_sen_slope", "candidate_key_audit", "source_cover_greedy",
    # wave 34: entropy rate, Simpson flips, churn labels
    "markov_entropy_rate", "simpson_flip_report", "churn_training_set",
    # wave 35: weighted jaccard, seasonal index, fold balance
    "source_weighted_jaccard", "seasonal_index", "fold_balance_report",
    # wave 36: daily ACF, peak detection, elasticity
    "daily_acf", "daily_peaks", "elasticity_by_brand",
    # wave 37: session lift, Kish ESS, leave-one-source-out
    "session_type_lift", "decay_ess", "loso_mean_chars",
    # wave 38: gains table, KMV containment, session entry/exit
    "gains_table_chars", "kmv_containment", "session_entry_exit",
    # wave 39: conformal coverage, stable top words, entry conversion
    "conformal_coverage", "stable_top_words",
    "session_conversion_by_entry",
    # wave 40: DAU new/returning, hour entropy
    "dau_new_returning", "user_hour_entropy",
    # round 4: suffix-array dup spans, HTML quality eval, IVFADC
    "sa_dup_spans", "html_extract_eval", "ann_topk_ivfpq",
    # round 4 wave 41: EWMA days, spikes, OLS trend, Good-Turing
    "daily_ewma_counts", "spike_days", "nation_revenue_trend",
    "goodturing_counts",
    # round 4 wave 42: cohort retention, drawdown, Lorenz deciles
    "cohort_retention", "revenue_drawdown", "revenue_lorenz",
    # round 4 wave 43: order audit, heatmap, interarrival buckets
    "event_order_audit", "dow_hour_heatmap", "interarrival_buckets",
    # round 4 wave 44: sessionize sweep, dup-span coverage
    "sessionize_sweep", "dup_span_coverage",
    # round 4 wave 45: Heaps curve, log-rank survival A/B
    "heaps_curve", "logrank_lifetimes",
    # round 4 wave 46/47: training chunk plan, IPF raking
    "chunk_for_training", "ipf_raking",
    # round 4 wave 48/49: Chao1, Bloom FPR, alias, label dispersion
    "unseen_vocab_estimate", "bloom_fpr_audit",
    "alias_sampling_table", "label_dispersion",
    "label_centroid_shift", "ip_topk_exact",
    # round 5 wave A: C4 line filter, probe locator, mojibake,
    # l-diversity, Cohen's d, partial correlation
    "c4_line_filter", "probe_positions", "mojibake_audit",
    "l_diversity_audit", "effect_size_chars", "partial_corr_chars",
    # round 5 wave B: line-df boilerplate removal, skip-grams,
    # robust-z outliers
    "line_df_removal", "skipgram_counts", "mad_anomalies",
    # round 5 wave C: KN counts, oracled CMS, composed C4 chain
    "kn_discount_counts", "cms_oracle_table", "c4prep",
    # round 5 wave D: winsorized mean, PR curve, bias model
    "huber_mean_chars", "quality_pr_curve", "bias_model_biases",
    # round 5 wave E: embedding exact dedup, kNN label eval
    "embedding_exact_dedup", "knn_label_eval",
    "l1_line_fit",
    # round 5 wave G: crawl schedule, bucketed-storage join
    "crawl_schedule", "bucketed_join", "bloom_anti_audit",
    "dup_cluster_size_hist", "eta_squared_chars",
    "rank_biserial_chars", "degree_assortativity",
    "char_bigram_entropy", "vocab_coverage_curve",
    "mann_kendall_daily",
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", QUERIES)
def test_total_on_empty_input(empty_sf, name):
    m = _entry()
    out = m.queries()[name](empty_sf)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert len(out) >= 0  # no exception is the contract


@pytest.fixture(scope="module")
def one_row_sf(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_one")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        tab = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tab.slice(0, 1), str(dst / f"{t}.parquet"))
    return str(dst)


ONE_ROW_QUERIES = [
    # the two that once crashed on partial dims
    "brand_copurchase", "revenue_by_region",
    # degenerate-math representatives (zero variance, single tie block,
    # single month, k > n)
    "chars_skew_by_source", "chars_kurtosis_by_source",
    "mannwhitney_chars", "ks_chars", "chars_gmd_by_source",
    "monthly_revenue_delta", "weighted_median_price", "ann_topk",
    "market_share", "order_total_audit",
    "price_band_orders", "global_doc_rank", "quantity_woe",
    "lang_target_encoding", "user_value_kendall",
    "emd_chars", "score_auc", "scd2_intervals", "user_active_time",
    "link_common_neighbors", "hits_scores", "peer_window_sums",
    "isotonic_calibration", "source_jsd", "lang_share_ci",
    "user_value_locf", "user_burstiness", "asof_join_tolerance",
    "running_balance", "sequence_motifs",
    "quantile_map_sources", "k_anonymity_audit", "salting_plan",
    "kmv_distinct_users", "bucket_merkle_diff", "wet_roundtrip",
    "psi_chars_drift", "nfc_audit", "orders_by_isoweek",
    "ols2_by_source", "changepoint_by_user", "max_drawdown_by_user",
    "chars_token_spearman", "runs_test_by_user", "peak_hour_by_user",
    "type_switch_rate", "event_gap_quantiles", "hapax_rate_by_source",
    "source_bow_gram", "levene_absdev_chars",
    "user_type_entropy", "reorder_rate", "spend_activity_corr",
    "top_word_per_source", "first_event_type_counts",
    # wave 13: autocorr, transitions, vocab jaccard, HHI, edit dist
    "user_value_autocorr", "type_transitions", "source_vocab_jaccard",
    "nation_revenue_hhi", "adjacent_edit_distance",
    # wave 14: activity analytics, pareto, dup-rate, histogram
    "dau_stickiness", "retention_cohorts", "nation_pareto80",
    "source_dup_rate", "chars_histogram",
    # wave 15: profiler, pagination, lift, char classes
    "orders_profile", "orders_topk_offset", "copurchase_lift",
    "char_class_profile",
    # wave 16: embedding audit, LCP template detector, lifespans
    "embedding_quant_stats", "source_lcp", "user_lifespan_hist",
    # recovered shadowed ops (renamed)
    "chars_width_histogram", "retention_cohorts_cal", "orders_profile_long",
    # wave 17: ANOVA F, Cramer's V, Theil, class weights, OHLC,
    # systematic sample, centroid cosine, FK orphans
    "anova_f_chars", "cramers_v", "nation_theil", "class_weight_plan",
    "user_daily_ohlc", "systematic_sample", "label_centroid_cosine",
    "fk_orphans",
    # wave 18: survival, KMV overlap, calibration
    "user_survival_km", "kmv_type_overlap", "langid_calibration",
    # wave 19: interpolation resample, z-order layout, gini split
    "user_value_interp", "zorder_layout", "best_split_chars",
    # wave 20: NB classifier, Markov stationary, AMS F2, zone maps,
    # jackknife
    "nb_lang_confusion", "event_type_stationary", "ams_f2_users",
    "zonemap_prune", "jackknife_mean_chars",
    # wave 21: busdays, feature table, MMR, permutation test, GDPR,
    # IVM merge
    "business_days_latency", "customer_feature_table", "mmr_select",
    "hash_permutation_test", "gdpr_erasure_audit", "ivm_delta_merge",
    # wave 22: trade SSSP, quota apportionment, hierarchy shares
    "trade_distance", "quota_allocation", "hierarchy_share",
    # wave 23: expectations, hypothetical rank, quantized pair dot
    "expectations_audit", "hypothetical_rank", "embedding_pair_dot",
    # wave 24: lag xcorr, ANALYZE stats, key-gap audit
    "type_lag_xcorr", "analyze_table_sketch", "sequence_gaps",
    # wave 25: dwell time, YoY revenue, dim profile
    "type_dwell_time", "yoy_revenue", "embedding_dim_profile",
    # wave 26: contrastive pairs, encoding advisor, decay score
    "contrastive_pairs", "encoding_advisor", "decay_score",
    # wave 27: hashing trick, SNM blocking, label propagation
    "feature_hashing_stats", "snm_dup_candidates",
    "label_propagation_langs",
    # wave 28: kappa, consistent hashing, RRF fusion
    "lang_kappa", "consistent_hash_balance", "rrf_fusion",
    # wave 29: churn jaccard, growth curve, compressibility
    "dau_churn_jaccard", "user_growth_curve",
    "compress_ratio_by_source",
    # wave 30: join-size estimate, conformal interval, Markov backtest
    "join_size_estimate", "conformal_chars_interval",
    "markov_next_accuracy",
    # wave 31: linear attribution, diff-in-diff, RBO
    "linear_attribution", "diff_in_diff", "rbo_rankings",
    # wave 32: curriculum, negative sampling, last-3 snapshot
    "curriculum_order", "negative_sampling_table", "user_last3_types",
    # wave 33: Theil-Sen, candidate keys, greedy set cover
    "theil_sen_slope", "candidate_key_audit", "source_cover_greedy",
    # wave 34: entropy rate, Simpson flips, churn labels
    "markov_entropy_rate", "simpson_flip_report", "churn_training_set",
    # wave 35: weighted jaccard, seasonal index, fold balance
    "source_weighted_jaccard", "seasonal_index", "fold_balance_report",
    # wave 36: daily ACF, peak detection, elasticity
    "daily_acf", "daily_peaks", "elasticity_by_brand",
    # wave 37: session lift, Kish ESS, leave-one-source-out
    "session_type_lift", "decay_ess", "loso_mean_chars",
    # wave 38: gains table, KMV containment, session entry/exit
    "gains_table_chars", "kmv_containment", "session_entry_exit",
    # wave 39: conformal coverage, stable top words, entry conversion
    "conformal_coverage", "stable_top_words",
    "session_conversion_by_entry",
    # wave 40: DAU new/returning, hour entropy
    "dau_new_returning", "user_hour_entropy",
    # round 4: suffix-array dup spans, HTML quality eval, IVFADC
    "sa_dup_spans", "html_extract_eval", "ann_topk_ivfpq",
    # round 4 wave 41: EWMA days, spikes, OLS trend, Good-Turing
    "daily_ewma_counts", "spike_days", "nation_revenue_trend",
    "goodturing_counts",
    # round 4 wave 42: cohort retention, drawdown, Lorenz deciles
    "cohort_retention", "revenue_drawdown", "revenue_lorenz",
    # round 4 wave 43: order audit, heatmap, interarrival buckets
    "event_order_audit", "dow_hour_heatmap", "interarrival_buckets",
    # round 4 wave 44: sessionize sweep, dup-span coverage
    "sessionize_sweep", "dup_span_coverage",
    # round 4 wave 45: Heaps curve, log-rank survival A/B
    "heaps_curve", "logrank_lifetimes",
    # round 4 wave 46/47: training chunk plan, IPF raking
    "chunk_for_training", "ipf_raking",
    # round 4 wave 48/49: Chao1, Bloom FPR, alias, label dispersion
    "unseen_vocab_estimate", "bloom_fpr_audit",
    "alias_sampling_table", "label_dispersion",
    "label_centroid_shift", "ip_topk_exact",
    # round 5 wave A: C4 line filter, probe locator, mojibake,
    # l-diversity, Cohen's d, partial correlation
    "c4_line_filter", "probe_positions", "mojibake_audit",
    "l_diversity_audit", "effect_size_chars", "partial_corr_chars",
    # round 5 wave B: line-df boilerplate removal, skip-grams,
    # robust-z outliers
    "line_df_removal", "skipgram_counts", "mad_anomalies",
    # round 5 wave C: KN counts, oracled CMS, composed C4 chain
    "kn_discount_counts", "cms_oracle_table", "c4prep",
    # round 5 wave D: winsorized mean, PR curve, bias model
    "huber_mean_chars", "quality_pr_curve", "bias_model_biases",
    # round 5 wave E: embedding exact dedup, kNN label eval
    "embedding_exact_dedup", "knn_label_eval",
    "l1_line_fit",
    # round 5 wave G: crawl schedule, bucketed-storage join
    "crawl_schedule", "bucketed_join", "bloom_anti_audit",
    "dup_cluster_size_hist", "eta_squared_chars",
    "rank_biserial_chars", "degree_assortativity",
    "char_bigram_entropy", "vocab_coverage_curve",
    "mann_kendall_daily",
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", ONE_ROW_QUERIES)
def test_total_on_single_row_input(one_row_sf, name):
    m = _entry()
    out = m.queries()[name](one_row_sf)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert len(out) >= 0
