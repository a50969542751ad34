"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Each query runs $SPARK_GRAFT_REPS times (default 2); the reported
per-query number is the MIN across reps (the warm, steady-state cost —
single-run numbers drifted +/-30% on unchanged queries between rounds
purely from JIT/suite-order noise). "queries_spread" records max-min
per query so regressions can be told apart from variance.

rec_svd_topk runs at a pinned reduced scale (sf0.01, key suffixed) —
the faithful sequential-SGD mode is the one driver-side operator and
would dominate the sf0.1 suite; timing it separately still tracks its
regressions round over round. rec_als_topk (the distributed scale
path) runs at full suite scale.

Prints exactly ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "queries_spread": {...}, "reps": N,
 "sf": <float>}
"""

from __future__ import annotations

import json
import os
import sys
import time

SVD_SF_DIR = "/root/testdata/sf0.01"


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
    headline = [
        "rec_itemcos_topk", "rec_itempear_topk", "rec_usercos_topk",
        "rec_userpear_topk", "rec_itemcos_scorefilter",
        "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue", "q18_big_volume_customers",
        "window_top_orders_per_customer", "subquery_above_avg_customers",
        "events_hourly_rollup",
        "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_simhash", "embedding_neardup", "embedding_neardup_fast",
        "embedding_neardup_ivf", "ann_cosine_topk", "ann_lsh_topk",
        "ann_ivf_topk", "text_token_stats", "text_quality", "text_lang_id", "text_repetition", "text_pii_redaction",
        "doc_fingerprint",
        "text_tfidf_top_terms", "events_sessionize", "rec_join_ilike",
        "rollup_lineitem", "cube_order_matrix", "window_running_revenue", "rec_peruser_topk", "dedup_lsh_verified",
        "dedup_clusters", "quantile_prices", "recursive_month_spine",
        "semijoin_order_lines", "leftjoin_null_handling",
        "multimodal_frame_plan", "multimodal_features",
        "multimodal_resize_plan", "rec_als_topk",
        "ann_ivf_multiprobe", "embedding_neardup_ivf2",
        "pipeline_clean_docs", "ann_sq8_topk", "doc_winnow_fingerprints",
        "docs_chunked", "docs_hash_sample",
    ]
    # (query, sf_dir override) entries timed at a pinned reduced scale
    special = [("rec_svd_topk", SVD_SF_DIR)]

    # one warm-up pass to amortize JVM/parquet-footer costs out of the
    # first query touching each big table (lineitem via q1, events via
    # the ratings projection — recomputed lazily by every CF query, so
    # nothing is unfairly cached, only footers/JIT warmed)
    queries["q1_pricing_summary"](spark, sf_dir).count()
    entrymod._ratings(spark, sf_dir).count()
    from recdb_postgresql_spark.sources.readers import load_table
    for t in ("documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    def timed(name: str, d: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, d).count()  # forces full execution
        return time.perf_counter() - t0

    runs: dict[str, list[float]] = {}
    for rep in range(reps):
        for name in headline:
            runs.setdefault(name, []).append(timed(name, sf_dir))
        for name, d in special:
            key = f"{name}@{os.path.basename(d.rstrip('/'))}"
            runs.setdefault(key, []).append(timed(name, d))

    times = {n: round(min(ts), 3) for n, ts in runs.items()}
    spread = {n: round(max(ts) - min(ts), 3) for n, ts in runs.items()}
    out = {
        "metric": "recdb_spark headline suite wall-clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "queries_spread": spread,
        "reps": reps,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
