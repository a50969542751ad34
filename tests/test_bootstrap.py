"""Poisson bootstrap CI (operators/stats.poisson_bootstrap_ci):
interval sanity on a planted distribution, ~1/sqrt(n) width scaling,
and partitioning invariance (the bit-reproducibility claim)."""

import math

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import stats


def _uniform_df(spark, n, lo=0.0, hi=100.0, grp="a"):
    # deterministic pseudo-uniform values from a hash of the id
    return (spark.range(n)
            .select(F.lit(grp).alias("g"), F.col("id").alias("rid"),
                    (F.conv(F.substring(F.md5(F.col("id").cast("string")),
                                        1, 8), 16, 10).cast("long")
                     % 10_000 / 10_000.0 * (hi - lo) + lo).alias("v")))


def test_bootstrap_ci_covers_mean_and_is_ordered(spark):
    df = _uniform_df(spark, 4000)
    row = stats.poisson_bootstrap_ci(df, "g", "v", "rid",
                                     n_boot=60).collect()[0]
    assert row["ci_lo"] < row["mean"] < row["ci_hi"]
    # uniform(0,100): mean ~50, se ~ 100/sqrt(12)/sqrt(4000) ~ 0.46;
    # a 95% CI must be a few se wide, not degenerate, not huge
    assert 0.5 < row["ci_hi"] - row["ci_lo"] < 4.0
    assert abs(row["mean"] - 50.0) < 3.0


def test_bootstrap_width_shrinks_with_n(spark):
    small = stats.poisson_bootstrap_ci(
        _uniform_df(spark, 500), "g", "v", "rid", n_boot=60).collect()[0]
    big = stats.poisson_bootstrap_ci(
        _uniform_df(spark, 8000), "g", "v", "rid", n_boot=60).collect()[0]
    ratio = (small["ci_hi"] - small["ci_lo"]) / (big["ci_hi"] - big["ci_lo"])
    # expected sqrt(16) = 4; allow bootstrap noise
    assert 2.0 < ratio < 8.0, ratio


def test_bootstrap_partitioning_invariant(spark):
    df = _uniform_df(spark, 2000)
    a = stats.poisson_bootstrap_ci(df.repartition(17), "g", "v", "rid",
                                   n_boot=40).collect()[0]
    b = stats.poisson_bootstrap_ci(df.coalesce(1), "g", "v", "rid",
                                   n_boot=40).collect()[0]
    assert tuple(a) == tuple(b)


def test_poisson_weight_distribution(spark):
    # the hash-thresholded weights must match Poisson(1) frequencies
    from recdb_postgresql_spark.functions.hashing import md5_long
    from recdb_postgresql_spark.operators.stats import _POISSON1_CDF60

    n = 50_000
    h = spark.range(n).select(
        md5_long(F.col("id").cast("string")).alias("h"))
    w = F.when(F.col("h") < _POISSON1_CDF60[0], 0)
    for k in range(1, 6):
        w = w.when(F.col("h") < _POISSON1_CDF60[k], k)
    w = w.otherwise(6)
    freq = {r["w"]: r["n"] for r in
            h.select(w.alias("w")).groupBy("w")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    for k in (0, 1, 2):
        expect = math.exp(-1) / math.factorial(k)
        assert abs(freq[k] / n - expect) < 0.01, (k, freq[k] / n, expect)


def test_diff_in_diff_planted_effect(spark):
    # control: 10 -> 12 (trend +2); treated: 10 -> 15 (trend +2,
    # effect +3); noise-free -> did exactly 3, se 0 -> t NULL? no:
    # add tiny within-cell variance so se > 0
    rows = []
    for i in range(40):
        eps = (i % 2) * 0.2
        rows += [(True, False, 10.0 + eps), (True, True, 15.0 + eps),
                 (False, False, 10.0 + eps), (False, True, 12.0 + eps)]
    df = spark.createDataFrame(rows, ["trt", "post", "v"])
    r = stats.diff_in_diff(df, F.col("trt"), F.col("post"),
                           "v").collect()[0]
    assert r["did"] == 3.0
    assert r["m_t_post"] == 15.1 and r["m_c_pre"] == 10.1
    assert r["se"] > 0 and r["t_stat"] > 10
    assert r["n_t_pre"] == 40


def test_rbo_identical_and_disjoint(spark):
    a = spark.createDataFrame([(i, i) for i in range(1, 21)],
                              ["item", "rank"])
    b = spark.createDataFrame([(i + 100, i) for i in range(1, 21)],
                              ["item", "rank"])
    same = stats.rank_biased_overlap(a, a, "item", p=0.9,
                                     depth=20).collect()[0]
    # identical truncated lists: (1-p) sum p^(d-1) = 1 - p^20
    assert abs(same["rbo"] - (1 - 0.9 ** 20)) < 1e-6
    diff = stats.rank_biased_overlap(a, b, "item", p=0.9,
                                     depth=20).collect()[0]
    assert diff["rbo"] == 0.0


def test_rbo_hand_case(spark):
    # A = [1,2,3], B = [2,1,4]: overlap at d=1:0, d=2:2, d=3:2
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              ["item", "rank"])
    b = spark.createDataFrame([(2, 1), (1, 2), (4, 3)],
                              ["item", "rank"])
    r = stats.rank_biased_overlap(a, b, "item", p=0.5,
                                  depth=3).collect()[0]
    expect = 0.5 * (0.5 ** 0 * 0 / 1 + 0.5 ** 1 * 2 / 2
                    + 0.5 ** 2 * 2 / 3)
    assert abs(r["rbo"] - expect) < 1e-6


def test_kendall_tau_b_exact(spark):
    # hand case with ties: x=[1,1,2,3], y=[1,2,2,3]
    # pairs: (1,2):x tie ->0; (1,3):C; (1,4):C; (2,3): y tie ->0;
    # (2,4):C; (3,4):C -> C=4, D=0
    # T_x pairs=1 (two x=1), T_y pairs=1 (two y=2); n0=6
    # tau_b = 4/sqrt((6-1)*(6-1)) = 0.8
    df = spark.createDataFrame([(1, 1), (1, 2), (2, 2), (3, 3)],
                               ["a", "b"])
    r = stats.kendall_tau_b(df, "a", "b").collect()[0]
    assert r["n"] == 4 and r["tau_b"] == 0.8
    # perfect monotone, no ties -> 1.0
    df2 = spark.createDataFrame([(i, i * 2) for i in range(10)],
                                ["a", "b"])
    assert stats.kendall_tau_b(df2, "a", "b").collect()[0]["tau_b"] == 1.0


def test_ece_mce_hand_case(spark):
    # bin 0.05 (b=0): 10 rows, 2 pos, mean score 0.05 -> gap 0.15
    # bin 0.95 (b=9): 10 rows, 10 pos, mean 0.95 -> gap 0.05
    rows = [(0.05, 1)] * 2 + [(0.05, 0)] * 8 + [(0.95, 1)] * 10
    df = spark.createDataFrame(rows, ["s", "y"])
    from pyspark.sql import functions as F
    r = stats.expected_calibration_error(df, "s", F.col("y") == 1,
                                         bins=10).collect()[0]
    assert r["n"] == 20
    assert abs(r["ece"] - 0.1) < 1e-9  # (10*0.15 + 10*0.05)/20
    assert abs(r["mce"] - 0.15) < 1e-9


def test_rbo_extrapolated_forms(spark):
    """Webber eq. 11 / eq. 30 closed forms: identical lists score
    rbo_ext == 1.0 exactly at any depth; disjoint lists pin all three
    at 0; rbo <= rbo_min <= rbo_ext always (the truncated sum stops,
    min adds the GUARANTEED tail overlap X_D/d, ext the larger
    X_D/D)."""
    import math

    a = spark.createDataFrame([(i, i) for i in range(1, 21)],
                              ["item", "rank"])
    b = spark.createDataFrame([(i + 100, i) for i in range(1, 21)],
                              ["item", "rank"])
    same = stats.rank_biased_overlap(a, a, "item", p=0.9,
                                     depth=20).collect()[0]
    # A_d = 1 for all d -> extrapolation is the full geometric series
    assert same["rbo_ext"] == 1.0
    # eq. 11 by hand: rbo + (1-p)/p * X_D * (ln(1/(1-p)) - sum p^d/d)
    min_mult = (0.1 / 0.9) * (math.log(10.0)
                              - sum(0.9 ** d / d for d in range(1, 21)))
    assert abs(same["rbo_min"]
               - ((1 - 0.9 ** 20) + min_mult * 20)) < 1e-6
    assert same["rbo"] <= same["rbo_min"] <= same["rbo_ext"]
    diff = stats.rank_biased_overlap(a, b, "item", p=0.9,
                                     depth=20).collect()[0]
    assert (diff["rbo"], diff["rbo_min"], diff["rbo_ext"]) == (0, 0, 0)
