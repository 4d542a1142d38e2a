"""Both _grouped_by_partition execution paths (single-task small input
vs hash-partitioned shuffle) must be semantically identical for every
resolve kernel built on the helper.  The sf test inputs always take the
small path; _FORCE_SHUFFLE pins the big path so this suite proves the
at-scale plan, not just the local fast path."""
import importlib.util
import os

import pandas as pd
import pytest


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_mod_paths", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


SF = "/root/testdata/sf0.001"

QUERIES = ["revenue_by_nation", "customer_order_coverage", "chunk_dedup",
           "event_gaps", "running_totals", "sessionize", "asof_join",
           "exact_dedup", "textprep", "except_users",
           "cust_order_distribution", "brand_suppliers",
           "rich_quiet_customers", "window3_sums",
           "top_return_customers", "min_cost_supplier",
           "disjunctive_part_revenue", "funnel_counts",
           "local_supplier_volume", "order_event_range_counts",
           "nation_pair_volume", "small_qty_revenue", "market_share",
           "profit_by_nation", "late_priority_counts",
           "sole_late_supplier", "chars_ntile_by_source",
           "user_first_last", "chars_skew_by_source",
           "dominant_suppliers", "range_window_sums", "dup_span_stats",
           "triangle_counts", "training_shards", "all_user_ids",
           "event_next_gaps", "bloom_semi_revenue",
           "cross_source_overlap", "vocab_jaccard", "rolling_median",
           "attributed_purchases", "retention_cohorts_cal", "user_paths",
           "gram_edit_pairs", "remove_dup_spans", "ssjoin_jaccard",
           "big_spender_customers", "quiet_customers",
           "nth_event_per_user", "record_high_events",
           "prefix_dedup_best", "brand_copurchase",
           "asof_join_forward", "chars_kurtosis_by_source",
           "mannwhitney_chars", "ks_chars", "weighted_median_price",
           "user_value_integral", "chars_gmd_by_source",
           "order_total_audit", "conversion_latency",
           "cdc_compaction", "order_streaks", "order_gap_stats",
           "ssjoin_containment", "late_event_counts",
           "snapshot_diff", "stratified_hash_sample",
           # round-3 waves 5-8 keyed ops
           "scd2_intervals", "user_active_time", "link_common_neighbors",
           "peer_window_sums", "user_value_locf", "user_burstiness",
           "running_balance", "sequence_motifs", "key_skew_report",
           "asof_join_tolerance", "changepoint_by_user",
           "max_drawdown_by_user",
           # round-3 wave 11 keyed ops
           "chars_token_spearman", "runs_test_by_user",
           "peak_hour_by_user", "type_switch_rate",
           "event_gap_quantiles", "source_bow_gram",
           "levene_absdev_chars",
           # round-3 wave 12 keyed ops
           "user_type_entropy", "reorder_rate", "spend_activity_corr",
           "top_word_per_source", "first_event_type_counts",
           # round-3 wave 13 keyed ops
           "user_value_autocorr", "type_transitions",
           "source_vocab_jaccard", "nation_revenue_hhi",
           "adjacent_edit_distance",
           # round-3 wave 14 keyed ops
           "dau_stickiness", "retention_cohorts", "nation_pareto80",
           # round-3 wave 15 keyed ops
           "orders_profile", "copurchase_lift",
           # round-3 wave 16 keyed ops
           "user_lifespan_hist",
           # round-3 wave 17 keyed ops
           "user_daily_ohlc", "nation_theil", "fk_orphans",
           # round-3 wave 19/20/21 keyed ops
           "user_value_interp", "event_type_stationary",
           "business_days_latency", "customer_feature_table",
           # round-3 wave 22/23 keyed ops
           "trade_distance", "hierarchy_share", "embedding_pair_dot",
           # round-3 wave 24/25/26 keyed ops
           "sequence_gaps", "type_dwell_time",
           "contrastive_pairs", "encoding_advisor",
           # round-3 wave 27/29 keyed ops
           "snm_dup_candidates", "label_propagation_langs",
           "dau_churn_jaccard",
           # round-3 wave 30 keyed ops
           "join_size_estimate", "conformal_chars_interval",
           "markov_next_accuracy",
           # round-3 wave 31/32 keyed ops
           "linear_attribution", "curriculum_order",
           "user_last3_types", "markov_entropy_rate",
           "session_type_lift", "session_entry_exit",
           "session_conversion_by_entry",
           # round-3 wave 40 keyed ops
           "dau_new_returning", "user_hour_entropy",
           # round 4: prefix-doubling suffix-array dup spans
           "sa_dup_spans", "nation_revenue_trend",
           "goodturing_counts", "cohort_retention",
           "interarrival_buckets", "sessionize_sweep",
           "dup_span_coverage", "heaps_curve",
           "logrank_lifetimes", "unseen_vocab_estimate",
           # round 5 keyed ops (hash-partitioned pandas passes)
           "line_df_removal", "skipgram_counts", "kn_discount_counts",
           "c4prep", "mad_anomalies", "bias_model_biases",
           "l_diversity_audit", "huber_mean_chars",
           "crawl_schedule", "dup_cluster_size_hist", "l1_line_fit",
           "embedding_exact_dedup", "degree_assortativity",
           "rank_biserial_chars"]
# pack_sequences is deliberately absent: packing is layout-dependent by
# nature, so the op pins ONE explicit hash-partition path instead of the
# adaptive helper (see ops/corpus.pack_sequences docstring).
# doc_bfs_hops is also absent: 6 frontier rounds x 2 exchanges under
# _FORCE_SHUFFLE cost minutes at 4 CPUs; the forced-shuffle path is
# covered directly on a tiny graph in
# tests/test_graph_ops.py::TestBfsHops::test_forced_shuffle_path.


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", QUERIES)
def test_small_and_shuffle_paths_agree(name):
    from pdf_extract_ray.ops import dedup as dedup_mod
    m = _entry()
    q = m.queries()[name]

    def run():
        res = q(SF)
        if hasattr(res, "to_pandas"):  # Dataset or pa.Table
            res = res.to_pandas()
        return _canon(pd.DataFrame(res))

    assert dedup_mod._FORCE_SHUFFLE is False
    small = run()
    dedup_mod._FORCE_SHUFFLE = True
    try:
        big = run()
    finally:
        dedup_mod._FORCE_SHUFFLE = False
    pd.testing.assert_frame_equal(small, big)
    assert len(small) > 0
