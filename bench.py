"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Each query runs $SPARK_GRAFT_REPS times (default 2); the reported
per-query number is the MIN across reps (the warm, steady-state cost —
single-run numbers drifted +/-30% on unchanged queries between rounds
purely from JIT/suite-order noise).

Output contract (the driver keeps the LAST 2000 CHARS of stdout —
measured from BENCH_r05.json, whose "tail" field is exactly 2000
chars and starts mid-line): exactly ONE JSON line, and the line must
fit the window WHOLE. Rounds 3-5 all lost the official record to this
(spread dict, rc=1 crash, then the 85-entry per-query dict at ~2.5 KB
— the start of the line, with "value", fell out of the window). So
the printed line now carries only scalars plus a FIXED dozen flagship
timings (~600 bytes, asserted < 1500 in build_output and pinned by
tests/test_bench_contract.py); the full per-query min dict, spreads,
slope section, and error tracebacks all live in BENCH_DETAIL.json
next to this file. "r1_common_value" is the sum over the 35 queries
shared with the r1 recorded baseline (BASELINE.md's round-over-round
comparison number, 83.3 s at r1) computed here so the record carries
it directly.

Resilience: a query that raises is recorded in "errors" (count on
the printed line, name -> traceback in BENCH_DETAIL.json) and costs
the suite nothing else — one broken query must not zero out the whole
round's record (round 4's record was an rc=1 traceback). A query that
succeeded on an earlier rep KEEPS that timing (the error is recorded
alongside, "partial" in the detail file) — dropping it silently
shrank round-over-round totals.

Scaling slopes: the priciest queries also run at sf0.01
(key suffixed "@sf0.01") so round-over-round numbers carry two data
points per expensive operator, not one.

rec_svd_topk runs at a pinned reduced scale (sf0.01, key suffixed) —
the faithful sequential-SGD mode is the one driver-side operator and
would dominate the sf0.1 suite; timing it separately still tracks its
regressions round over round. rec_als_topk (the distributed scale
path) runs at full suite scale.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

SVD_SF_DIR = "/root/testdata/sf0.01"
SLOPE_SF_DIR = "/root/testdata/sf0.01"

HEADLINE = [
    "rec_itemcos_topk", "rec_itempear_topk", "rec_usercos_topk",
    "rec_userpear_topk", "rec_itemcos_scorefilter",
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue",
    "q18_big_volume_customers",
    "window_top_orders_per_customer", "subquery_above_avg_customers",
    "events_hourly_rollup",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "embedding_neardup", "embedding_neardup_fast",
    "embedding_neardup_ivf", "ann_cosine_topk", "ann_lsh_topk",
    "ann_ivf_topk", "text_token_stats", "text_quality", "text_lang_id",
    "text_repetition", "text_pii_redaction",
    "doc_fingerprint",
    "text_tfidf_top_terms", "events_sessionize", "rec_join_ilike",
    "rollup_lineitem", "cube_order_matrix", "window_running_revenue",
    "rec_peruser_topk", "dedup_lsh_verified",
    "dedup_clusters", "dedup_clusters_star", "dedup_lsh_verified_xxhash",
    "ann_ivf_trained",
    "quantile_prices", "recursive_month_spine",
    "semijoin_order_lines", "leftjoin_null_handling",
    "multimodal_frame_plan", "multimodal_features",
    "multimodal_resize_plan", "rec_als_topk",
    "ann_ivf_multiprobe", "embedding_neardup_ivf2",
    "pipeline_clean_docs", "ann_sq8_topk", "doc_winnow_fingerprints",
    "docs_chunked", "docs_hash_sample",
    "events_asof_join", "text_bigram_commonality", "docs_contamination", "geo_knn_join", "geo_range_join",
    "setop_customer_activity", "values_scan_join", "string_functions",
    "date_functions", "case_priority_matrix", "agg_distinct_segments",
    "agg_approx_sketches", "doc_winnow_overlap_pairs", "docs_lang_cap",
    "events_asof_strict", "rec_itemcos_model", "recsql_join_topk",
    "text_lang_confusion",
    # round 6: persisted-index probes (indexes built in warmup, so the
    # timed reps measure the amortized probe), time-decay CF, and the
    # skew-bounded as-of variant
    "ann_ivf_indexed", "dedup_incremental", "ann_ivf_trained_probe",
    "rec_itemcos_halflife", "events_asof_bucketed",
    "events_interval_join", "events_interval_overlap",
    "events_resample_6h", "docs_pack_sequences",
    # round 7: split/quality-cut/heavy-hitter/semantic-dedup/JSON
    "docs_split_assign", "docs_quality_filter", "text_top_ngrams",
    "semantic_dedup", "events_json_props", "dedup_jaccard_prefix",
    "docs_strip_spans", "docs_bm25", "docs_importance_dsir",
    "docs_mix_sample", "graph_pagerank", "events_profile",
    "fulljoin_user_activity", "events_histogram",
    "rec_popular_topk", "rec_eval_rmse", "text_lm_perplexity",
    "dedup_incremental_neardup", "docs_hybrid_rrf",
    "pivot_lineitem_status", "unpivot_part_metrics", "rec_item_cooccur",
    "lateral_top_orders", "events_ewma",
    "docs_containment", "docs_corpus_diff", "events_winsorize",
    "grouping_sets_returns", "events_wow_growth", "rec_eval_beyond",
    "dedup_exact_normalized", "agg_order_parts_list",
    "multimodal_crossmodal_topk", "events_key_skew", "docs_related_tfidf",
    "events_debounce", "events_time_to_convert", "events_cms_user_counts",
    "rec_similar_items", "events_rfm", "docs_topic_clusters",
    "events_outliers_mad", "nation_revenue_share", "rec_negative_samples",
    "rec_eval_loo_hit", "window_frame_functions", "events_histogram_eqdepth",
    "rec_trending_items", "part_content_similar",
    "events_retention_rate", "order_ship_lag",
    "lineitem_stats_agg", "rec_blend_topk",
    "graph_triangles", "rec_markov_next", "events_outliers",
    "docs_dsir_resample", "rec_eval_prec_at_k", "text_bpe_tokens",
    "rec_eval_ndcg",
    # round 7 late batch: corpus-cleaning v2 + entity resolution
    "docs_segment_dedup", "docs_c4_flags", "docs_ccnet_tiers",
    "docs_token_budget", "er_customer_matches", "er_customer_best",
    "split_leakage_pairs", "embedding_dim_stats", "events_funnel",
    "events_cohorts", "lineitem_bloom_semijoin", "events_attribution",
    "events_moving_avg",
    # round 8 wave 1: MERGE upsert, SCD2, exact edit-distance join
    "events_merge_upsert", "user_state_scd2", "er_exact_editjoin",
    # round 8 wave 2: bias baseline + MMR diversity re-rank
    "rec_baseline_topk", "rec_mmr_rerank",
    # round 8 wave 3: BFS blast radius, PCA-reduced ANN, distilled
    # quality classifier
    "graph_bfs_hops", "ann_pca_topk", "docs_quality_classifier",
    # round 8 wave 4: drift report + seasonal baseline
    "events_profile_drift", "events_seasonality",
    # round 8 wave 5: hash-checked kNN classifier + PG FTS analog
    "ann_knn_classify", "docs_fts_match",
    # round 8 wave 6: PG DISTINCT ON + walk-forward temporal eval
    "distinct_on_latest_order", "rec_eval_walkforward",
    "events_cdc_diff", "ann_pq_topk", "ann_ivfpq_topk",
    "ann_ivfpq_indexed", "er_cross_source_links", "events_ols_value",
    # round 8 (this round): amortized classifier probe + the r7-advice
    # exercise queries + the round's new operators
    "docs_quality_classifier_probe", "rec_als_implicit",
    "rec_als_foldin_check", "docs_lcs_spans", "docs_entropy_filter",
    "events_theilsen_daily", "er_short_string_links", "docs_fts_ranked",
    "docs_tfidf_string_ids", "orders_skew_salted_join",
    "docs_strip_lcs", "docs_self_repeats",
    "events_theilsen_by_type", "er_part_composite",
    "events_seasonal_decompose", "events_anomaly_residual",
    "dedup_incremental_spans", "rec_item2vec_similar",
    "docs_temperature_mix",
    # round 9: implicit-model cold-user fold-in self-check + lang-ID
    "rec_als_implicit_foldin", "docs_lang_classifier",
    "text_unigram_tokens", "graph_label_prop", "events_psi_drift",
    "events_survival", "ann_recall_at_k", "dedup_canonical_pick",
    "events_changepoint", "events_holt_forecast", "dedup_lsh_recall",
    "ann_dim_truncation_recall", "events_hw_forecast",
    "events_attribution_decay", "docs_source_overlap",
    "events_cohort_ltv", "supplier_pareto",
    # round 9: TPC-H adapted battery (q1/q3/q5/q18 landed in r1)
    "q6_forecast_revenue", "q4_order_priority", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q12_late_priority", "q13_customer_distribution", "q14_promo_effect",
    "q15_top_supplier", "q16_supplier_part_counts", "q17_small_quantity",
    "q19_discounted_revenue", "q22_sales_opportunity", "q2_min_cost_supplier",
    # round 9 continuation: battery completion + stats/sketch/graph/text
    "q11_important_stock", "q20_potential_promotion",
    "q21_suppliers_waiting", "events_welch_ab", "events_chi_square",
    "events_benford", "events_hll_users", "graph_hits", "graph_sssp",
    "docs_readability", "docs_keyness", "embedding_outliers_maha",
    "events_conversion_z", "events_anova", "lineitem_corr_matrix",
    "events_acf", "events_ks", "events_mannwhitney", "customer_gini",
    "events_top_paths", "er_trgm_similar", "docs_weighted_sample",
    "events_kanon_audit", "events_l_diversity", "lineitem_quality_checks",
    "rec_fpgrowth_rules", "docs_textrank", "events_cumulative_users",
    "embedding_procrustes_check", "rec_wilson_topk",
    "events_hll_error_curve", "rec_eval_ips", "part_price_elasticity",
    "events_cusum", "events_dispersion", "graph_kcore",
    "dedup_minhash_estimate", "events_audience_overlap",
    "docs_heaps_curve", "docs_zipf_slope",
    "events_lorenz_deciles", "feat_target_encode_loo", "er_jw_rerank",
    "events_sprt", "audit_orders_fingerprint", "shard_rendezvous",
    "events_quantile_normalize", "docs_stratified_sample",
    "events_mg_heavy_hitters", "docs_lang_auc", "docs_lang_calibration",
    "docs_lang_gains", "geo_dbscan", "er_blocking_quality",
    "events_hll_by_type", "events_kmv_overlap", "events_qini_uplift",
    "audit_fk_integrity", "lineitem_spearman", "graph_assortativity",
    "events_user_streaks", "graph_clustering",
    # fourth-session batch
    "events_ddq_quantiles", "events_bootstrap_ci", "orders_mad_outliers",
    "docs_js_divergence", "audit_fd_check", "events_ivm_rollup",
    "docs_lang_isotonic", "events_forecast_eval", "events_markov",
    "docs_collocations", "events_t_closeness", "events_rfm",
    "events_ddq_by_type", "lineitem_joinsize_cms", "events_peaks",
    "rec_covisitation", "events_did", "rec_ranking_rbo",
    "events_impute", "events_markov_attribution",
    "embedding_silhouette", "docs_vocab_coverage",
    "events_hazard", "events_logrank", "graph_modularity",
    "docs_lang_ece", "lineitem_kendall",
    # round 10: amortized modularity metric probe (labels persisted in
    # warmup; the timed work is the metric, not the LPA rebuild)
    "graph_modularity_probe",
    # round 11: shared-warmup-fit serving probes (one ALS model / one
    # lang model per regime per process, many consumers — r10 verdict
    # next #3/#4; the fold-in checks now read the same shared fits)
    "rec_als_served", "docs_lang_classifier_probe",
]

# the priciest operators also timed at sf0.01 for a scaling slope
# (+ events_hourly_rollup: crashed r4 on the timestamp encoding — a
# slope row guards the readers.py normalization fix round over round)
SLOPE = [
    "text_repetition", "embedding_neardup_ivf2", "rec_als_topk",
    "pipeline_clean_docs", "embedding_neardup_ivf", "dedup_clusters",
    "ann_ivf_multiprobe", "dedup_minhash_lsh", "events_hourly_rollup",
    "semantic_dedup", "graph_pagerank", "dedup_jaccard_prefix",
    "docs_related_tfidf", "docs_topic_clusters",
    # round 8 heavies: edit joins, BFS, classifier
    "er_exact_editjoin", "er_cross_source_links", "graph_bfs_hops",
    "docs_quality_classifier", "docs_lcs_spans",
]

# the 35 queries shared with the r1 recorded baseline (BENCH_r01.json)
# — BASELINE.md's round-over-round comparison set. Do not edit: the
# point is a stable basket.
R1_COMMON = [
    "ann_cosine_topk", "ann_ivf_topk", "dedup_clusters", "dedup_exact",
    "dedup_lsh_verified", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "doc_fingerprint", "embedding_neardup",
    "embedding_neardup_fast", "events_hourly_rollup", "events_sessionize",
    "leftjoin_null_handling", "multimodal_features", "multimodal_frame_plan",
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue",
    "quantile_prices", "rec_itemcos_scorefilter", "rec_itemcos_topk",
    "rec_itempear_topk", "rec_join_ilike", "rec_peruser_topk",
    "rec_usercos_topk", "rec_userpear_topk", "recursive_month_spine",
    "rollup_lineitem", "semijoin_order_lines",
    "subquery_above_avg_customers", "text_quality", "text_tfidf_top_terms",
    "text_token_stats", "window_top_orders_per_customer",
]

# fixed flagship basket printed on the headline line (small by design;
# everything else is in BENCH_DETAIL.json)
FLAGSHIP = [
    "q1_pricing_summary", "rec_itemcos_topk", "rec_als_topk",
    "dedup_minhash_lsh", "dedup_clusters_star", "embedding_neardup_ivf",
    "ann_ivf_topk", "ann_ivf_indexed", "dedup_incremental",
    "text_repetition", "pipeline_clean_docs", "events_asof_join",
]


def run_calibration(spark, reps: int = 3) -> float:
    """Fixed-shape machine-state probe (VERDICT r7 next #7): a pure
    codegen sum over spark.range — no I/O, no data dependence, no
    code under test — so its round-over-round drift measures the
    MACHINE (CPU contention, JIT, thermal state), not the engine.
    BASELINE.md normalizes the round table with it. Min over reps,
    like every suite entry."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32) \
            .selectExpr("sum(id * 3 + id % 7) AS s").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def build_output(times: dict, errors: dict, reps: int, sf: float,
                 calib: float | None = None,
                 r1_iso: float | None = None) -> dict:
    """The printed headline record. MUST serialize well under the
    driver's 2000-char stdout tail window (asserted here; pinned with
    a worst-case registry in tests/test_bench_contract.py).

    ``r1_iso`` is the ISOLATED r1-common basket (VERDICT r9 next #2):
    the 35 baseline-shared queries timed in a dedicated pass right
    after warm-up, BEFORE the other ~300 suite entries contaminate
    the JVM (GC pressure, code-cache churn grew the in-suite basket
    number 39.4 -> 52.3 s between r8 and r9 with zero code changes).
    "r1_common_value" stays the in-suite reading for continuity;
    "r1_common_isolated" is the cross-round-comparable number."""
    in_total = set(HEADLINE) | {"rec_svd_topk@sf0.01"}
    total = round(sum(t for n, t in times.items() if n in in_total), 3)
    common = {n: t for n, t in times.items() if n in R1_COMMON}
    # a query failing ALL reps has no timing — its absence would make
    # `value` shrink, reading as a speedup; name the casualties on the
    # line (capped: full list in BENCH_DETAIL.json's errors)
    missing = sorted(n for n in in_total if n not in times)
    out = {
        "metric": "recdb_spark headline suite wall-clock",
        "value": total,
        "unit": "sec",
        "n_queries": len(times),
        "r1_common_value": round(sum(common.values()), 3),
        "r1_common_isolated": r1_iso,
        "r1_common_n": len(common),
        "errors": len(errors),
        "missing": len(missing),
        "missing_names": missing[:3],
        "reps": reps,
        "sf": sf,
        "calib": calib,
        "queries": {n: times[n] for n in FLAGSHIP if n in times},
    }
    if len(json.dumps(out)) > 1500:  # belt + suspenders vs the window
        out.pop("queries")
    assert len(json.dumps(out)) <= 1500, "headline line outgrew the driver window"
    return out


def _gc_sweep(spark) -> None:
    """Collect Python frames, drop leftover localCheckpoint blocks and
    nudge the JVM — the cadence that keeps late suite entries from
    timing ~10% slow under accreted block-store pressure (measured:
    47.3 s -> ~42 s on the r1-common basket inside the full suite)."""
    import gc
    gc.collect()
    jsc = spark.sparkContext._jsc
    for rdd in jsc.getPersistentRDDs().values():
        rdd.unpersist(False)
    spark.sparkContext._jvm.System.gc()


def run_r1_isolated(spark, queries, sf_dir: str, reps: int):
    """The 35-query r1-common basket timed FIRST, in a clean JVM
    (only warm-up + calibration have run), so the cross-round
    comparison number is insulated from suite growth (VERDICT r9
    next #2 / wrong #1: the in-suite reading inflated 33% between
    r8 and r9 purely from 214 -> 334 co-resident suite entries).
    Same discipline as the main loop: min over reps, errors recorded
    not raised, gc cadence every 8 runs."""
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    n = 0
    for rep in range(reps):
        for name in R1_COMMON:
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                queries[name](spark, sf_dir).count()
                runs.setdefault(name, []).append(time.perf_counter() - t0)
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}".split("\n")[0][:160]
            n += 1
            if n % 8 == 0:
                _gc_sweep(spark)
    times = {n2: round(min(ts), 3) for n2, ts in runs.items()}
    return times, errors


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "2")))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    from recdb_postgresql_spark.engine import get_spark

    spark = get_spark("recdb_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    # (key, query, sf_dir) runs; slope entries rep=1 (already min-biased
    # at the small scale, and 8 extra cold runs cost ~nothing at sf0.01)
    plan = [(n, n, sf_dir, reps) for n in HEADLINE]
    plan += [("rec_svd_topk@sf0.01", "rec_svd_topk", SVD_SF_DIR, reps)]
    if os.path.abspath(sf_dir) != os.path.abspath(SLOPE_SF_DIR):
        plan += [(f"{n}@sf0.01", n, SLOPE_SF_DIR, 1) for n in SLOPE]

    # one warm-up pass to amortize JVM/parquet-footer costs out of the
    # first query touching each big table (lineitem via q1, events via
    # the ratings projection — recomputed lazily by every CF query, so
    # nothing is unfairly cached, only footers/JIT warmed)
    queries["q1_pricing_summary"](spark, sf_dir).count()
    entrymod._ratings(spark, sf_dir).count()
    from recdb_postgresql_spark.sources.readers import load_table
    for t in ("documents", "embeddings"):
        load_table(spark, sf_dir, t).count()
    # persisted indexes + trained centroids: built ONCE here so the
    # timed reps of ann_ivf_indexed / dedup_incremental /
    # ann_ivf_trained_probe measure the probe, not the build
    entrymod.build_bench_indexes(spark, sf_dir)
    calib = run_calibration(spark)

    # isolated r1-common pass — BEFORE the full suite touches the JVM
    iso_times, iso_errors = run_r1_isolated(spark, queries, sf_dir, reps)
    r1_iso = round(sum(iso_times.values()), 3) if iso_times else None

    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    tracebacks: dict[str, str] = {}
    max_reps = max(r for _, _, _, r in plan)
    gc_every = 0
    for rep in range(max_reps):
        for key, name, d, nreps in plan:
            if rep >= nreps or key in errors:
                continue
            t0 = time.perf_counter()
            try:
                queries[name](spark, d).count()  # forces full execution
                runs.setdefault(key, []).append(time.perf_counter() - t0)
            except Exception as exc:  # record, keep benching the rest;
                # an earlier successful rep's timing is KEPT (partial)
                errors[key] = f"{type(exc).__name__}: {exc}".split("\n")[0][:160]
                tracebacks[key] = traceback.format_exc()
            # the checkpoint-heavy entries (pagerank, triangles, prefix
            # filter, LM perplexity) pin localCheckpoint RDD blocks
            # until the Python frames AND the JVM ContextCleaner drop
            # them; sweep outside the timer, every few queries
            gc_every += 1
            if gc_every % 8 == 0:
                _gc_sweep(spark)

    times = {n: round(min(ts), 3) for n, ts in runs.items()}
    # value = headline suite + the pinned SVD entry (the r1-r3 total's
    # composition); the new @sf0.01 slope entries are informational only
    out = build_output(times, errors, reps, sf, calib, r1_iso)
    detail = {
        "queries": times,
        "r1_isolated_queries": iso_times,
        "r1_isolated_errors": iso_errors,
        "queries_spread": {n: round(max(ts) - min(ts), 3)
                           for n, ts in runs.items() if len(ts) > 1},
        "slope_sf": SLOPE,
        "errors": tracebacks,
        "partial": sorted(set(errors) & set(times)),
        "n_queries": len(times),
        "cpus": cpus,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
