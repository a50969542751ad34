"""Leave-one-out target encoding semantics (functions/encoding.py)."""

import pytest

from recdb_postgresql_spark.functions.encoding import target_encode_loo


def test_loo_excludes_own_row_and_singleton_prior(spark):
    rows = [("a", 10), ("a", 20), ("a", 30), ("b", 100)]
    df = spark.createDataFrame(rows, ["k", "y"])
    out = {(r["k"], r["y"]): r for r in
           target_encode_loo(df, ["k"], "y", smoothing_m=2.0).collect()}
    # LOO for ('a', 10) is mean(20, 30) = 25 — own label excluded.
    assert out[("a", 10)]["te_loo"] == pytest.approx(25.0)
    assert out[("a", 20)]["te_loo"] == pytest.approx(20.0)
    assert out[("a", 30)]["te_loo"] == pytest.approx(15.0)
    # Singleton key: no LOO information -> global prior 160/4 = 40.
    assert out[("b", 100)]["te_loo"] == pytest.approx(40.0)
    # Smoothed (m=2): (sum - y + m*prior) / (cnt - 1 + m).
    assert out[("a", 10)]["te_smooth"] == pytest.approx((50 + 80) / 4.0)
    # Singleton smoothed collapses exactly to the prior.
    assert out[("b", 100)]["te_smooth"] == pytest.approx(40.0)


def test_loo_mean_of_encodings_is_unbiased_per_key(spark):
    # For cnt>1 keys, sum of LOO encodings == sum of plain means*(cnt)
    # i.e. the encoder doesn't shift the per-key average.
    rows = [("a", float(v)) for v in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, ["k", "y"])
    vals = [r["te_loo"] for r in
            target_encode_loo(df, ["k"], "y").collect()]
    assert sum(vals) / len(vals) == pytest.approx(3.0)


def test_quantile_normalize_equalizes_marginals(spark):
    from pyspark.sql import functions as F

    from recdb_postgresql_spark.functions.encoding import quantile_normalize

    # group a: 1..8 ; group b: 101..108 (same shape, shifted scale)
    rows = ([("a", i, float(i)) for i in range(1, 9)]
            + [("b", i + 10, float(100 + i)) for i in range(1, 9)])
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    out = quantile_normalize(df, "g", "v", "id")
    got = {(r["g"], r["v"]): r["qnorm"] for r in out.collect()}
    # both groups map onto identical pooled quantiles
    a_vals = sorted(v for (g, _), v in got.items() if g == "a")
    b_vals = sorted(v for (g, _), v in got.items() if g == "b")
    assert a_vals == b_vals
    # monotone within group: rank order preserved
    assert got[("a", 1.0)] < got[("a", 8.0)]
    # rank-8-of-8 maps to the pooled max (index (7*15)//7 = 15)
    assert got[("a", 8.0)] == 108.0 and got[("b", 108.0)] == 108.0
    # row count preserved
    assert out.count() == 16


def test_stratified_sample_exact_total_and_proportions(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from recdb_postgresql_spark.functions.sampling import (
        stratified_sample_exact as stratified_sample)

    # strata 600/300/100 -> a 100-row sample should allocate 60/30/10
    rows = ([("a", i) for i in range(600)]
            + [("b", 1000 + i) for i in range(300)]
            + [("c", 2000 + i) for i in range(100)])
    df = spark.createDataFrame(rows, ["g", "id"])
    out = stratified_sample(df, "g", F.col("id").cast("string"), 100)
    got = [(r["g"], r["id"]) for r in out.collect()]
    cnt = Counter(g for g, _ in got)
    assert sum(cnt.values()) == 100
    assert cnt == {"a": 60, "b": 30, "c": 10}
    # deterministic: same rows on a different partitioning
    out2 = stratified_sample(df.repartition(13), "g",
                             F.col("id").cast("string"), 100)
    assert sorted(got) == sorted((r["g"], r["id"]) for r in out2.collect())
    # Hamilton semantics: the spare unit goes to the LARGEST
    # remainder (a: 51/101 beats b: 50/101) — tiny strata are not
    # guaranteed representation
    tiny = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", 200)], ["g", "id"])
    got3 = Counter(r["g"] for r in stratified_sample(
        tiny, "g", F.col("id").cast("string"), 50).collect())
    assert got3 == {"a": 50}
    # budget beyond the population: every stratum contributes all it
    # has (undershoot surfaced, no respill)
    got4 = Counter(r["g"] for r in stratified_sample(
        tiny, "g", F.col("id").cast("string"), 200).collect())
    assert got4 == {"a": 100, "b": 1}
