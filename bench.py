#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:
    {"metric": ..., "value": secs, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N}

--scaling: run the headline extraction in FRESH processes at N and 4N
CPUs (default 3 and 12 — both inside the shared host's real capacity;
override with GRAFT_SCALING_N / GRAFT_SCALING_4N, e.g. 8/32 on a quiet
host) on the same input and report both throughputs + scaling
efficiency (the sandbox stand-in for the N->4N-node criterion;
BASELINE.md records the results and the capacity analysis).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _num_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base[2:] if base.startswith("sf") else "0.1"


def _init_ray(num_cpus: int):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def run_headline(sf_dir: str):
    """Flagship extraction over the synthetic pages table; consumed by an
    aggregate so the pipeline streams end-to-end.

    A warmup pass over one input shard spins up the Ray worker pool first
    (workers pay module imports once per process); the timed number is
    steady-state throughput, which is what the 100 TB scenario runs at.
    """
    import glob as _glob
    import __ray_entry__ as entrymod
    from pdf_extract_ray.pipelines.extract import extract_dataset
    import ray
    pages_dir = os.environ.get("GRAFT_PAGES_DIR_OVERRIDE") or entrymod._pages_dir(sf_dir)
    import pyarrow.compute as pc_

    def _consume(path):
        """Stream the full pipeline; tiny projected columns come back to
        the driver (a write_parquet stand-in without IO variance —
        Dataset.sum() itself costs seconds and would pollute the metric)."""
        ds = ray.data.read_parquet(path, columns=["url", "html"])
        result = extract_dataset(ds)
        proj = result.map_batches(
            lambda b: b.select(["payload_bytes", "n_chars"]),
            batch_format="pyarrow")
        rows = payload = chars = 0
        for b in proj.iter_batches(batch_format="pyarrow"):
            rows += b.num_rows
            payload += pc_.sum(b.column("payload_bytes")).as_py() or 0
            chars += pc_.sum(b.column("n_chars")).as_py() or 0
        return rows, payload, chars

    warm_file = sorted(_glob.glob(os.path.join(pages_dir, "*.parquet")))[0]
    for _ in range(2):  # warm the worker pool + code/object caches
        _consume(warm_file)
    t0 = time.perf_counter()
    rows, payload, _chars = _consume(pages_dir)
    dt = time.perf_counter() - t0
    payload_mb = payload / 1e6
    return {"secs": dt, "rows": rows, "docs_per_s": rows / dt,
            "payload_mb": payload_mb, "mb_per_s": payload_mb / dt}


def run_ops(sf_dir: str):
    """Secondary pipelines: the training-data operators.  Best-of-2 per
    op (two full interleaved passes) — the shared host has 2-5x wall-time
    swings and a single pass regularly records a load spike, not the
    engine."""
    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    names = ["token_counts", "quality_scores", "exact_dedup", "lang_id",
             "minhash_neardup", "simhash_neardup", "ann_topk", "ann_topk_lsh",
             "events_hourly", "sessionize", "top_customers",
             "extract_by_pages", "textprep", "tpch_q1", "revenue_by_nation",
             "asof_join", "word_frequencies", "distinct_users",
             "top_docs_per_lang", "median_chars_by_source",
             "big_spender_customers", "quiet_customers",
             "sliding_window_counts", "label_centroids",
             "approx_distinct_users", "audio_features",
             "normalize_text", "sessionize_salted", "asof_join_left",
             "approx_value_quantiles", "ann_topk_ivf", "ccprep",
             "asof_join_salted", "stratified_sample", "decontaminate",
             "repetition_scores", "chunk_dedup", "tfidf_top_terms",
             "gopher_filter", "dup_clusters", "weighted_sample",
             "mixture_sample", "inverted_index", "zscore_by_source",
             "quality_classifier", "promo_revenue", "revenue_by_region",
             "running_totals", "dup_clusters_salted", "heavy_hitters",
             "redact_pii", "props_k_stats", "customer_order_coverage",
             "embedding_pca", "doc_rollup", "lang_pivot",
             "shipping_priority", "order_priority_counts",
             "large_volume_customers", "orders_above_avg", "event_gaps",
             "chars_rank_by_source", "fuzzy_decontaminate",
             "chars_percentiles_by_source", "chars_mode_by_source",
             "doc_cube", "shared_user_ids", "event_transitions",
             "latest_event_per_user", "except_users",
             "cust_order_distribution", "brand_suppliers",
             "rich_quiet_customers", "window3_sums",
             "top_supplier_revenue", "top_return_customers",
             "min_cost_supplier", "disjunctive_part_revenue",
             "chars_quartiles_by_source", "source_chars_token_corr",
             "funnel_counts", "langs_per_source", "pack_sequences",
             "order_event_range_counts", "doc_pagerank",
             "orders_by_month", "local_supplier_volume",
             "nation_pair_volume", "image_resize", "chars_mad_by_source",
             "discount_revenue", "small_qty_revenue", "market_share",
             "profit_by_nation", "late_priority_counts",
             "sole_late_supplier", "significant_parts",
             "dominant_suppliers", "chars_ntile_by_source",
             "chars_pct_rank", "user_first_last", "chars_skew_by_source",
             "distinct_users_per_type", "top_bigrams", "bpe_merges",
             "lm_buckets", "embedding_clusters", "source_vocab_stats",
             "ann_topk_pq", "bm25_top_docs", "range_window_sums",
             "dup_span_stats", "triangle_counts", "cms_word_counts",
             "chars_width_histogram", "event_next_gaps", "value_share",
             "doc_grouping_sets", "bpe_encode_stats", "all_user_ids",
             "chars_token_regression", "winsorized_chars",
             "training_shards", "bloom_semi_revenue",
             "cross_source_overlap", "vocab_jaccard",
             "chars_iqr_outliers", "rolling_median", "image_dedup",
             "attributed_purchases", "retention_cohorts_cal", "user_paths",
             "gram_edit_pairs", "remove_dup_spans", "ssjoin_jaccard",
             "part_skyline", "doc_bfs_hops", "lang_gini_by_source",
             "nth_event_per_user", "brand_copurchase", "pmi_pairs",
             "asof_join_forward", "record_high_events",
             "prefix_dedup_best", "doc_stats_long",
             "chars_kurtosis_by_source", "orders_by_dow",
             "ann_topk_filtered", "monthly_revenue_delta",
             "weighted_avg_discount", "word_length_histogram",
             "mannwhitney_chars", "lang_source_contingency",
             "ks_chars", "benford_digits", "weighted_median_price",
             "user_value_integral", "release_prep",
             "chars_gmd_by_source", "order_total_audit",
             "shortest_docs_with_ties", "conversion_latency",
             "cdc_compaction", "neardup_eval_report",
             "above_avg_sources", "order_streaks", "order_gap_stats",
             "ssjoin_containment", "corpus_datacard",
             "full_coverage_customers", "target_mixture_sample",
             "late_event_counts", "snapshot_diff", "catalog_rowcounts",
             "order_size_distribution", "stratified_hash_sample",
             "orders_time_rollup", "quarter_share",
             "url_host_stats", "url_normalize_dedup",
             "lang_chi2_cells", "lang_entropy_by_source",
             "geomean_chars_by_source", "oov_rate_report",
             "trimmed_mean_chars", "snapshot_schema_union",
             "robots_audit", "crawlprep", "session_stats", "sentence_stats",
             "orders_profile_long", "tld_rollup",
             "dup_rate_by_source", "hourly_autocorr",
             "crawl_budget", "event_bigram_perplexity",
             "harmonic_mean_chars", "host_balance_gini",
             "split_leakage_report", "char_class_mix", "host_lorenz",
             "events_dow_hour", "order_sla_breach", "zipf_slope",
             "rfm_segments", "url_templates",
             "lang_confusion", "page_titles",
             "welch_t_value", "effective_langs",
             "sliding_distinct_users",
             "supplier_fill_rate", "revenue_concentration",
             "lineitem_integrity", "boilerplate_stats",
             "parquet_layout_audit", "jsonl_roundtrip",
             "price_band_orders",
             "global_doc_rank", "quantity_woe", "lang_target_encoding",
             "user_value_kendall",
             "extract_status_histogram", "extract_metadata",
             "doc_stats_by_source", "lang_histogram", "doc_size_buckets",
             "bpe_token_counts", "embedding_label_histogram",
             "deterministic_sample", "dataset_splits", "lm_scores",
             "incremental_dedup", "fingerprints", "ngram_neardup",
             "neardup_clusters", "neardup_cluster_dedup", "neardup_dedup",
             "embedding_neardup", "image_features", "ann_recall_report",
             "audio_resample", "frame_samples", "csv_roundtrip",
             "kcore_graph",
             "user_value_ewma", "rolling_spikes", "transition_entropy",
             "degree_histogram", "asof_join_nearest",
             "readability_scores", "events_hourly_gapfill",
             "lang_source_mi", "key_skew_report",
             "emd_chars", "score_auc", "scd2_intervals",
             "user_active_time", "link_common_neighbors",
             "hits_scores", "peer_window_sums", "isotonic_calibration",
             "source_jsd", "lang_share_ci", "user_value_locf",
             "user_burstiness", "asof_join_tolerance",
             "running_balance", "sequence_motifs",
             "quantile_map_sources", "k_anonymity_audit",
             "salting_plan", "kmv_distinct_users",
             "bucket_merkle_diff", "wet_roundtrip",
             "psi_chars_drift", "nfc_audit", "orders_by_isoweek",
             "ols2_by_source", "changepoint_by_user",
             "max_drawdown_by_user",
             "chars_token_spearman", "runs_test_by_user",
             "peak_hour_by_user", "type_switch_rate",
             "event_gap_quantiles", "hapax_rate_by_source",
             "source_bow_gram", "levene_absdev_chars",
             "user_type_entropy", "reorder_rate",
             "spend_activity_corr", "top_word_per_source",
             "first_event_type_counts",
             "user_value_autocorr", "type_transitions",
             "source_vocab_jaccard", "nation_revenue_hhi",
             "adjacent_edit_distance",
             "dau_stickiness", "retention_cohorts", "nation_pareto80",
             "source_dup_rate", "chars_histogram",
             "orders_profile", "orders_topk_offset", "copurchase_lift",
             "char_class_profile",
             "embedding_quant_stats", "source_lcp",
             "user_lifespan_hist",
             "anova_f_chars", "cramers_v", "nation_theil",
             "class_weight_plan", "user_daily_ohlc",
             "systematic_sample", "label_centroid_cosine",
             "fk_orphans", "user_survival_km", "kmv_type_overlap",
             "langid_calibration",
             "user_value_interp", "zorder_layout", "best_split_chars",
             "nb_lang_confusion", "event_type_stationary",
             "ams_f2_users", "zonemap_prune", "jackknife_mean_chars",
             "business_days_latency", "customer_feature_table",
             "mmr_select", "hash_permutation_test",
             "gdpr_erasure_audit", "ivm_delta_merge",
             "trade_distance", "quota_allocation", "hierarchy_share",
             "expectations_audit", "hypothetical_rank",
             "embedding_pair_dot",
             "type_lag_xcorr", "analyze_table_sketch",
             "sequence_gaps",
             "type_dwell_time", "yoy_revenue",
             "embedding_dim_profile",
             "contrastive_pairs", "encoding_advisor", "decay_score",
             "feature_hashing_stats", "snm_dup_candidates",
             "label_propagation_langs",
             "lang_kappa", "consistent_hash_balance", "rrf_fusion",
             "dau_churn_jaccard", "user_growth_curve",
             "compress_ratio_by_source",
             "join_size_estimate", "conformal_chars_interval",
             "markov_next_accuracy",
             "linear_attribution", "diff_in_diff", "rbo_rankings",
             "curriculum_order", "negative_sampling_table",
             "user_last3_types",
             "theil_sen_slope", "candidate_key_audit",
             "source_cover_greedy",
             "markov_entropy_rate", "simpson_flip_report",
             "churn_training_set",
             "source_weighted_jaccard", "seasonal_index",
             "fold_balance_report",
             "daily_acf", "daily_peaks", "elasticity_by_brand",
             "session_type_lift", "decay_ess", "loso_mean_chars",
             "gains_table_chars", "kmv_containment",
             "session_entry_exit",
             "conformal_coverage", "stable_top_words",
             "session_conversion_by_entry",
             "dau_new_returning", "user_hour_entropy",
             # round 4: VERDICT items + waves 41-44
             "ann_topk_ivfpq", "html_extract_eval", "sa_dup_spans",
             "daily_ewma_counts", "spike_days", "nation_revenue_trend",
             "goodturing_counts", "cohort_retention",
             "revenue_drawdown", "revenue_lorenz", "event_order_audit",
             "dow_hour_heatmap", "interarrival_buckets",
             "sessionize_sweep", "dup_span_coverage"]
    # future-proof: any queries() entry not explicitly ordered above
    # still gets measured (new waves can't silently skip the bench)
    names += [n for n in sorted(qs) if n not in names]
    out = {}
    # soft wall budget: the first pass ALWAYS completes (every op gets a
    # measurement); the second best-of-2 pass stops when the budget is
    # spent so a growing op suite can't blow an external time limit
    budget = float(os.environ.get("GRAFT_BENCH_BUDGET", "900"))
    t_start = time.perf_counter()
    for _pass in range(2):
        for name in names:
            if name not in qs:
                continue
            if _pass > 0 and time.perf_counter() - t_start > budget:
                print("bench: budget reached; keeping first-pass walls "
                      "for the remaining ops", file=sys.stderr)
                return out
            t0 = time.perf_counter()
            try:
                res = qs[name](sf_dir)
                # consume: Dataset -> full execution; Table is done
                if hasattr(res, "to_pandas") and hasattr(res, "iter_batches"):
                    n = 0
                    for b in res.iter_batches(batch_format="pyarrow"):
                        n += b.num_rows
            except Exception as e:  # record, don't lose the whole bench
                print(f"bench: {name} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr)
                out.setdefault(name, -1.0)
                continue
            dt = round(time.perf_counter() - t0, 3)
            if name not in out or out[name] < 0 or dt < out[name]:
                out[name] = dt
    return out


def main_bench(sf_dir: str, headline_only: bool = False) -> dict:
    num_cpus = _num_cpus()
    _init_ray(num_cpus)
    head = run_headline(sf_dir)
    head2 = run_headline(sf_dir)  # best-of-2: shared-host noise defense
    if head2["secs"] < head["secs"]:
        head = head2
    queries = {"extract_pages": round(head["secs"], 3)}
    if not headline_only:
        queries.update(run_ops(sf_dir))
    result = {
        "metric": "docs_per_sec_extracted",
        "value": round(head["secs"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(_sf_of(sf_dir)),
        "num_cpus": num_cpus,
        "extra": {
            "headline_rows": head["rows"],
            "docs_per_s": round(head["docs_per_s"], 1),
            "payload_mb": round(head["payload_mb"], 2),
            "mb_per_s": round(head["mb_per_s"], 2),
        },
    }
    return result


#  N and 4N CPUs, chosen to fit INSIDE the host's actually-available
#  capacity (~22 effective cores shared with other tenants; asking for
#  more than is free measures the neighbors, not the engine).  Override
#  via GRAFT_SCALING_N / GRAFT_SCALING_4N for quiet-host 8->32 runs.
SCALING_N = int(os.environ.get("GRAFT_SCALING_N", "3"))
SCALING_4N = int(os.environ.get("GRAFT_SCALING_4N", "12"))
SCALING_ROWS = 160000    # ~3 min of CPU: large enough to amortize fixed
                         # per-run overhead, the regime a real job runs in


def main_scaling(sf_dir: str) -> dict:
    """Same job, fresh processes, N and 4N CPUs on the same input
    (sandbox stand-in for the N->4N-node criterion).  Best of 2 runs per
    level defends against shared-host noise."""
    from pdf_extract_ray.data.pages import pages_parquet_path
    pages_dir = pages_parquet_path(SCALING_ROWS, n_giants=5,
                                   n_shards=SCALING_ROWS // 2000)
    runs = {}
    # interleave the levels so shared-host load drift hits both levels
    # symmetrically; keep the best run per level (the host time-slices
    # against other tenants with 2-5x swings)
    for cpus in (SCALING_N, SCALING_4N, SCALING_N, SCALING_4N,
                 SCALING_N, SCALING_4N):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
                   GRAFT_SF_DIR=sf_dir,
                   GRAFT_PAGES_DIR_OVERRIDE=pages_dir)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env, capture_output=True, text=True, timeout=3600)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        if cpus not in runs or r["value"] < runs[cpus]["value"]:
            runs[cpus] = r
    t_n = runs[SCALING_N]["value"]
    t_4n = runs[SCALING_4N]["value"]
    eff = t_n / (4.0 * t_4n)
    return {
        "metric": f"scaling_efficiency_{SCALING_N}_to_{SCALING_4N}_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"extract_pages_{SCALING_N}cpu": t_n,
            f"extract_pages_{SCALING_4N}cpu": t_4n,
        },
        "sf": float(_sf_of(sf_dir)),
        "num_cpus": SCALING_4N,
        "extra": {
            "scaling_rows": SCALING_ROWS,
            f"docs_per_s_{SCALING_N}cpu": runs[SCALING_N]["extra"]["docs_per_s"],
            f"docs_per_s_{SCALING_4N}cpu": runs[SCALING_4N]["extra"]["docs_per_s"],
            "ideal_speedup": 4.0,
            "measured_speedup": round(t_n / t_4n, 3),
        },
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()
    if args.scaling:
        out = main_scaling(args.sf_dir)
    else:
        out = main_bench(args.sf_dir, headline_only=args.headline_only)
    print(json.dumps(out))
    import ray
    if ray.is_initialized():
        ray.shutdown()
