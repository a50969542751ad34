"""Workload harness — the analog of the reference's libpq clients
(``PostgreSQL/experiments/rec_workload.c``: fire RECOMMEND queries,
accumulate wall-clock around each execution).

Runs N randomized single-user RECOMMEND queries (seeded RNG) against a
materialized recommender and reports latency stats as one JSON line.

Run: python workload.py [n_queries] [method]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    method = sys.argv[2] if len(sys.argv) > 2 else "itemcoscf"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from recdb_postgresql_spark.engine import RecEngine, get_spark
    from recdb_postgresql_spark.sources.readers import load_table, ratings_from_events

    spark = get_spark("recdb_workload")
    spark.sparkContext.setLogLevel("ERROR")
    events = ratings_from_events(load_table(spark, sf_dir, "events"))
    users = [r[0] for r in events.select("userid").distinct().collect()]

    eng = RecEngine(spark, workdir="/tmp/recdb_workload_models")
    try:
        eng.drop_recommender("wl")
    except ValueError:
        pass
    t0 = time.perf_counter()
    eng.create_recommender("wl", events, "userid", "itemid", "ratingval", method)
    t_create = time.perf_counter() - t0

    rng = random.Random(42)
    lat = []
    for _ in range(n_queries):
        uid = rng.choice(users)
        t0 = time.perf_counter()
        eng.recommend(events, "userid", "itemid", "ratingval", name="wl",
                      user_where=F.col("userid") == uid, k=10).collect()
        lat.append(time.perf_counter() - t0)

    # serving tier 2: precomputed RecView (IndexRecommend path) —
    # a pure filter + top-k per query
    t0 = time.perf_counter()
    eng.materialize_predictions("wl", events)
    t_view = time.perf_counter() - t0
    vlat = []
    for _ in range(n_queries):
        uid = rng.choice(users)
        t0 = time.perf_counter()
        eng.recommend_from_view("wl", user_where=F.col("userid") == uid,
                                k=10).collect()
        vlat.append(time.perf_counter() - t0)

    # serving tier 3 (factor models only): cold-user FOLD-IN — the
    # between-retrains path for users who arrived after the last
    # threshold retrain (closed-form ridge vs the stored item factors)
    flat = []
    if method == "svd":
        max_uid = max(users)
        for i in range(n_queries):
            new = spark.createDataFrame(
                [(max_uid + 1 + i, rng.choice(range(1, 50)),
                  float(rng.randint(40, 90))) for _ in range(3)],
                "userid long, itemid long, ratingval double")
            t0 = time.perf_counter()
            eng.recommend_foldin("wl", new, k=10).collect()
            flat.append(time.perf_counter() - t0)

    lat.sort(); vlat.sort(); flat.sort()
    out = {
        "metric": f"rec_workload {method} single-user top-10",
        "n_queries": n_queries,
        "create_s": round(t_create, 3),
        "avg_s": round(sum(lat) / len(lat), 3),
        "p50_s": round(lat[len(lat) // 2], 3),
        "p95_s": round(lat[int(len(lat) * 0.95)], 3),
        "total_s": round(sum(lat), 3),
        "recview_materialize_s": round(t_view, 3),
        "recview_avg_s": round(sum(vlat) / len(vlat), 3),
        "recview_p95_s": round(vlat[int(len(vlat) * 0.95)], 3),
        "sf_dir": sf_dir,
    }
    if flat:
        out["foldin_avg_s"] = round(sum(flat) / len(flat), 3)
        out["foldin_p95_s"] = round(flat[int(len(flat) * 0.95)], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
