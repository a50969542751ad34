"""Isotonic calibration (operators/stats.isotonic_calibration): PAV
pooling on constructed violations, monotonicity, weighted pooling,
and agreement with the brute-force minimax identity."""

from itertools import groupby

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import stats


def _fit(spark, rows, bins=10):
    # rows: (score, label)
    df = spark.createDataFrame(rows, ["s", "y"])
    return stats.isotonic_calibration(df, "s", F.col("y") == 1,
                                      bins=bins).collect()


def test_pav_pools_violation(spark):
    # bin rates 0.2, 0.8, 0.4 -> bins 2,3 pool to 0.6
    rows = ([(0.05, 1)] * 2 + [(0.05, 0)] * 8
            + [(0.15, 1)] * 8 + [(0.15, 0)] * 2
            + [(0.25, 1)] * 4 + [(0.25, 0)] * 6)
    out = _fit(spark, rows)
    assert [r["raw_rate"] for r in out] == [0.2, 0.8, 0.4]
    assert [r["iso_rate"] for r in out] == [0.2, 0.6, 0.6]


def test_pav_monotone_and_weighted(spark):
    # weights matter: a heavy low bin drags the pool toward itself
    rows = ([(0.05, 1)] * 30 + [(0.05, 0)] * 70     # 0.3, w=100
            + [(0.15, 1)] * 9 + [(0.15, 0)] * 1)    # 0.9, w=10
    rows += [(0.25, 1)] * 1 + [(0.25, 0)] * 9       # 0.1, w=10
    out = _fit(spark, rows)
    iso = [r["iso_rate"] for r in out]
    assert iso == sorted(iso)
    # pooled block (bins 1,2): (9+1)/(10+10) = 0.5, bin 0 stays 0.3
    assert iso == [0.3, 0.5, 0.5]


def test_pav_matches_minimax_bruteforce(spark):
    rows = []
    pattern = [(0.05, 3, 10), (0.15, 9, 12), (0.25, 2, 7),
               (0.35, 6, 9), (0.45, 1, 6), (0.55, 5, 5)]
    for s, pos, n in pattern:
        rows += [(s, 1)] * pos + [(s, 0)] * (n - pos)
    out = _fit(spark, rows)
    # brute-force max-min over the prefix lattice
    ns = [n for _, _, n in pattern]
    ps = [p for _, p, _ in pattern]
    for i, r in enumerate(out):
        cands = []
        for k in range(i + 1):
            best = min((sum(ps[k:j + 1]) / sum(ns[k:j + 1]))
                       for j in range(i, len(ns)))
            cands.append(best)
        assert r["iso_rate"] == max(cands), (i, r["iso_rate"])


def test_already_monotone_unchanged(spark):
    rows = ([(0.05, 1)] * 1 + [(0.05, 0)] * 9
            + [(0.55, 1)] * 5 + [(0.55, 0)] * 5
            + [(0.95, 1)] * 9 + [(0.95, 0)] * 1)
    out = _fit(spark, rows)
    assert all(r["iso_rate"] == r["raw_rate"] for r in out)
