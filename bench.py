"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <float>}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    from recdb_postgresql_spark.engine import get_spark

    spark = get_spark("recdb_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    headline = [
        "rec_itemcos_topk", "rec_itempear_topk", "rec_usercos_topk",
        "rec_userpear_topk", "rec_itemcos_scorefilter",
        "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue",
        "window_top_orders_per_customer", "subquery_above_avg_customers",
        "events_hourly_rollup",
        "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_simhash", "embedding_neardup", "embedding_neardup_fast",
        "embedding_neardup_ivf", "ann_cosine_topk", "ann_lsh_topk",
        "ann_ivf_topk", "text_token_stats", "text_quality", "doc_fingerprint",
        "text_tfidf_top_terms", "events_sessionize", "rec_join_ilike",
        "rollup_lineitem", "rec_peruser_topk", "dedup_lsh_verified",
        "dedup_clusters", "quantile_prices", "recursive_month_spine",
        "semijoin_order_lines", "leftjoin_null_handling",
        "multimodal_frame_plan", "multimodal_features",
        "multimodal_resize_plan",
    ]

    # one warm-up pass to amortize JVM/parquet-footer costs out of the
    # first query touching each big table (lineitem via q1, events via
    # the ratings projection — recomputed lazily by every CF query, so
    # nothing is unfairly cached, only footers/JIT warmed)
    queries["q1_pricing_summary"](spark, sf_dir).count()
    entrymod._ratings(spark, sf_dir).count()
    from recdb_postgresql_spark.sources.readers import load_table
    for t in ("documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    times: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()  # forces full execution
        times[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "recdb_spark headline suite wall-clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
