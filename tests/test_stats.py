"""Hypothesis-testing operators (operators/stats.py): hand-computed
parity for Welch's t, chi-square independence (incl. the empty-cell
expected mass), and the Benford digit audit."""

import math

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import stats


def _welch_manual(a, b):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 ** 2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return t, df


def test_welch_matches_manual(spark):
    treat = [12.1, 14.3, 11.8, 15.2, 13.9, 12.7]
    ctrl = [10.2, 11.1, 9.8, 10.9]
    rows = [("t", v) for v in treat] + [("c", v) for v in ctrl]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = stats.welch_ttest(df, "grp", "v", baseline="c").collect()
    assert len(out) == 1
    r = out[0]
    t, wdf = _welch_manual(treat, ctrl)
    assert r["n"] == 6
    assert abs(r["t_stat"] - round(t, 6)) < 1e-9
    assert abs(r["welch_df"] - round(wdf, 4)) < 1e-9
    assert abs(r["mean_diff"] - round(sum(treat) / 6 - sum(ctrl) / 4, 6)) < 1e-9


def test_welch_multiple_groups(spark):
    rows = ([("a", float(i)) for i in range(1, 6)]
            + [("b", float(2 * i)) for i in range(1, 6)]
            + [("base", float(i + 1)) for i in range(1, 6)])
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = {r["grp"]: r for r in
           stats.welch_ttest(df, "grp", "v", baseline="base").collect()}
    assert set(out) == {"a", "b"}
    # identical spread, mean shifted by exactly -1 => negative t for a
    assert out["a"]["t_stat"] < 0 < out["b"]["t_stat"]


def test_chi_square_independent_uniform(spark):
    # perfectly independent 2x2 with equal counts -> chi2 == 0
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(10)]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = stats.chi_square_independence(df, "a", "b").collect()[0]
    assert r["n"] == 40 and r["dof"] == 1
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0


def test_chi_square_empty_cell_mass(spark):
    # ('y','v') never occurs: the expected mass of that cell MUST
    # still contribute. Manual: obs = {xu:10, xv:10, yu:10, yv:0}
    rows = ([("x", "u")] * 10 + [("x", "v")] * 10 + [("y", "u")] * 10)
    df = spark.createDataFrame(rows, ["a", "b"])
    r = stats.chi_square_independence(df, "a", "b").collect()[0]
    n = 30.0
    exp = {("x", "u"): 20 * 20 / n, ("x", "v"): 20 * 10 / n,
           ("y", "u"): 10 * 20 / n, ("y", "v"): 10 * 10 / n}
    obs = {("x", "u"): 10, ("x", "v"): 10, ("y", "u"): 10, ("y", "v"): 0}
    chi2 = sum((obs[k] - e) ** 2 / e for k, e in exp.items())
    assert abs(r["chi2"] - round(chi2, 6)) < 1e-9
    assert abs(r["cramers_v"] - round(math.sqrt(chi2 / (n * 1)), 6)) < 1e-9


def test_benford_digits_and_terms(spark):
    # constructed sample: digit of 23.5 is 2, of 0.071 is 7, of 1000
    # (exact power of ten) is 1, of -450 is 4; zeros drop
    vals = [23.5, 0.071, 1000.0, -450.0, 0.0, 1.0, 99.9]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = {r["digit"]: r for r in
           stats.benford_first_digit(df, "v").collect()}
    assert set(out) == {1, 2, 4, 7, 9}
    assert out[1]["n_obs"] == 2           # 1000.0 and 1.0
    n = 6.0
    for d, r in out.items():
        bs = math.log10(1 + 1 / d)
        assert abs(r["benford_share"] - round(bs, 6)) < 1e-9
        share = r["n_obs"] / n
        assert abs(r["obs_share"] - round(share, 6)) < 1e-9
        assert abs(r["chi2_term"]
                   - round(n * (share - bs) ** 2 / bs, 6)) < 1e-6


def test_stats_plans_broadcast_no_sortmerge(spark):
    """The finishing joins are against category-sized relations: the
    physical plans must broadcast them, never sort-merge."""
    rows = [("g%d" % (i % 3), float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    for out in (stats.welch_ttest(df, "grp", "v", baseline="g0"),
                stats.chi_square_independence(df, "grp", "grp"),
                stats.benford_first_digit(df, "v")):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan


def test_two_proportion_ztest_manual(spark):
    import math
    # group a: 30/100 convert; base: 20/100
    rows = ([("a", True)] * 30 + [("a", False)] * 70
            + [("b", True)] * 20 + [("b", False)] * 80)
    df = spark.createDataFrame(rows, ["grp", "conv"])
    from recdb_postgresql_spark.operators.stats import two_proportion_ztest
    r = two_proportion_ztest(df, "grp", F.col("conv"), "b").collect()
    assert len(r) == 1 and r[0]["grp"] == "a"
    p, pb, pool = 0.3, 0.2, 0.25
    z = (p - pb) / math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert r[0]["n"] == 100 and r[0]["x"] == 30
    assert r[0]["rate"] == 0.3 and r[0]["rate_diff"] == 0.1
    assert abs(r[0]["z_stat"] - round(z, 6)) < 1e-9


def test_mahalanobis_planted_outlier_and_dead_dim(spark):
    from recdb_postgresql_spark.operators.similarity import (
        mahalanobis_outliers)
    import random
    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1), rng.gauss(5, 2), 3.0])
            for i in range(50)]
    rows.append((99, [30.0, 5.0, 3.0]))  # dim-0 outlier; dim 2 is dead
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = mahalanobis_outliers(df, top_k=3).collect()
    assert out[0]["vec_id"] == 99          # planted outlier ranks first
    assert out[0]["maha"] > 2 * out[1]["maha"]
    # the dead dimension contributed nothing (no NaN/inf anywhere)
    assert all(r["maha"] == r["maha"] and r["maha"] < 1e6 for r in out)


def test_anova_manual_and_two_group_t_equivalence(spark):
    # with 2 equal-variance groups, F == t^2 of the pooled t-test;
    # verify against a direct numpy computation
    import numpy as np
    a = [1.0, 2.0, 3.0, 4.0]
    b = [3.0, 4.0, 5.0, 6.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, ["grp", "v"])
    r = stats.anova_oneway(df, "grp", "v").collect()[0]
    allv = np.array(a + b)
    grand = allv.mean()
    ssb = 4 * (np.mean(a) - grand) ** 2 + 4 * (np.mean(b) - grand) ** 2
    ssw = np.var(a, ddof=1) * 3 + np.var(b, ddof=1) * 3
    f = (ssb / 1) / (ssw / 6)
    assert (r["n"], r["k"], r["dof_between"], r["dof_within"]) == (8, 2, 1, 6)
    assert abs(r["f_stat"] - round(f, 6)) < 1e-9
    assert abs(r["eta_sq"] - round(ssb / (ssb + ssw), 6)) < 1e-9


def test_corr_matrix_vs_numpy(spark):
    import numpy as np
    from recdb_postgresql_spark.operators.profile import corr_matrix
    rng = np.random.RandomState(3)
    x = rng.rand(200)
    y = 2 * x + rng.rand(200) * 0.1     # strongly correlated
    z = rng.rand(200)                    # independent
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
    df = spark.createDataFrame(rows, ["x", "y", "z"])
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    assert out[("x", "x")] == 1.0 and out[("z", "z")] == 1.0
    assert abs(out[("x", "y")] - round(float(np.corrcoef(x, y)[0, 1]), 6)) < 1e-5
    assert abs(out[("x", "z")] - round(float(np.corrcoef(x, z)[0, 1]), 6)) < 1e-5
    assert len(out) == 6


def test_corr_matrix_listwise_null_drop(spark):
    rows = [(1.0, 2.0), (2.0, 4.0), (3.0, None), (4.0, 8.0)]
    df = spark.createDataFrame(rows, ["x", "y"])
    from recdb_postgresql_spark.operators.profile import corr_matrix
    out = corr_matrix(df, ["x", "y"]).collect()
    assert all(r["n"] == 3 for r in out)
    xy = [r for r in out if (r["col_a"], r["col_b"]) == ("x", "y")][0]
    assert xy["corr"] == 1.0   # perfectly linear on the complete rows


def test_ks_manual_and_identical_distributions(spark):
    # a: {1,2,3}, b: {2,3,4} each once -> D = 1/3 at x in [1,2)
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 2.0), ("b", 3.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    r = stats.ks_test(df, "grp", "v", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert abs(r["d_stat"] - round(1 / 3, 6)) < 1e-9
    # identical samples -> D = 0
    same = spark.createDataFrame(
        [("a", float(v)) for v in range(5)]
        + [("b", float(v)) for v in range(5)], ["grp", "v"])
    r2 = stats.ks_test(same, "grp", "v", "a", "b").collect()[0]
    assert r2["d_stat"] == 0.0 and r2["ks_stat"] == 0.0


def test_ks_disjoint_supports_gives_one(spark):
    rows = ([("a", float(v)) for v in range(5)]
            + [("b", float(v + 100)) for v in range(7)])
    df = spark.createDataFrame(rows, ["grp", "v"])
    r = stats.ks_test(df, "grp", "v", "a", "b").collect()[0]
    assert r["d_stat"] == 1.0
    import math
    assert abs(r["ks_stat"] - round(math.sqrt(5 * 7 / 12), 6)) < 1e-9


def test_mann_whitney_manual_with_ties(spark):
    # a = {1, 2, 2, 5}, b = {2, 3, 4}
    # U_a = sum over a of (#b < x) + 0.5*(#b == x)
    #     = 0 + 0.5 + 0.5 + 3 = 4.0
    rows = ([("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0)]
            + [("b", 2.0), ("b", 3.0), ("b", 4.0)])
    df = spark.createDataFrame(rows, ["grp", "v"])
    r = stats.mann_whitney_u(df, "grp", "v", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert r["u_stat"] == 4.0
    # tie-corrected sigma: ties at v=2 (t=3)
    n = 7
    t3 = (3 ** 3 - 3)
    mu = 4 * 3 / 2
    sigma = math.sqrt(4 * 3 / 12 * ((n + 1) - t3 / (n * (n - 1))))
    assert abs(r["z_stat"] - round((4.0 - mu) / sigma, 6)) < 1e-9


def test_mann_whitney_shifted_distribution(spark):
    rows = ([("a", float(v)) for v in range(100, 150)]
            + [("b", float(v)) for v in range(50)])
    df = spark.createDataFrame(rows, ["grp", "v"])
    r = stats.mann_whitney_u(df, "grp", "v", "a", "b").collect()[0]
    assert r["u_stat"] == 2500.0     # every a beats every b
    assert r["z_stat"] > 8           # decisively shifted


def test_gini_extremes_and_uniform(spark):
    from recdb_postgresql_spark.operators.stats import gini
    # perfectly equal mass -> gini 0
    eq = spark.createDataFrame([(i, 10.0) for i in range(10)], ["e", "x"])
    assert gini(eq, "e", "x").collect()[0]["gini"] == 0.0
    # all mass on one entity of n -> gini -> (n-1)/n
    conc = spark.createDataFrame(
        [(0, 100.0)] + [(i, 0.0) for i in range(1, 10)], ["e", "x"])
    r = gini(conc, "e", "x").collect()[0]
    assert r["gini"] == 0.9 and r["n"] == 10 and r["total"] == 100.0
    # fact rows aggregate per entity first: duplicates must combine
    dup = spark.createDataFrame(
        [(i, 5.0) for i in range(10)] * 2, ["e", "x"])
    assert gini(dup, "e", "x").collect()[0]["gini"] == 0.0


def test_sprt_crosses_h1_on_high_rate_and_h0_on_low(spark):
    import math
    from pyspark.sql import functions as F
    # 10 buckets x 50 trials at 40% success: decisive for H1 p=0.3
    # vs H0 p=0.1; all-failure stream is decisive for H0.
    rows = [(b, 1 if i < 20 else 0) for b in range(10) for i in range(50)]
    df = spark.createDataFrame(rows, ["b", "x"])
    out = stats.sprt_monitor(df, F.col("b"), F.col("x") == 1,
                             p0=0.1, p1=0.3).collect()
    assert [r["trials"] for r in out] == [50 * (b + 1) for b in range(10)]
    # llr formula spot-check at the first peek
    la, lb = math.log(3.0), math.log(0.7 / 0.9)
    assert out[0]["llr"] == pytest.approx(20 * la + 30 * lb, abs=1e-6)
    assert out[-1]["decision"] == "accept_h1"
    # ambiguous evidence (rate between p0 and p1, tiny n) -> continue
    mid = spark.createDataFrame(
        [(0, 1 if i < 2 else 0) for i in range(10)], ["b", "x"])
    r = stats.sprt_monitor(mid, F.col("b"), F.col("x") == 1,
                           p0=0.1, p1=0.3).collect()[0]
    assert r["decision"] == "continue"
    lo = spark.createDataFrame([(b, 0) for b in range(10) for _ in range(50)],
                               ["b", "x"])
    out2 = stats.sprt_monitor(lo, F.col("b"), F.col("x") == 1,
                              p0=0.1, p1=0.3).collect()
    assert out2[-1]["decision"] == "accept_h0"
    with pytest.raises(ValueError):
        stats.sprt_monitor(df, F.col("b"), F.col("x") == 1, p0=0.2, p1=0.2)


def test_auc_rank_known_values(spark):
    # perfect separation -> 1.0; reversed -> 0.0; all-tied -> 0.5
    perf = spark.createDataFrame(
        [(float(s), s >= 5) for s in range(10)], ["sc", "y"])
    assert stats.auc_rank(perf, "sc", F.col("y")).collect()[0]["auc"] == 1.0
    rev = spark.createDataFrame(
        [(float(s), s < 5) for s in range(10)], ["sc", "y"])
    assert stats.auc_rank(rev, "sc", F.col("y")).collect()[0]["auc"] == 0.0
    tied = spark.createDataFrame(
        [(1.0, i % 2 == 0) for i in range(10)], ["sc", "y"])
    assert stats.auc_rank(tied, "sc", F.col("y")).collect()[0]["auc"] == 0.5
    # hand case: pos scores {3, 1}, neg {2, 0} -> pairs won 3 of 4
    hand = spark.createDataFrame(
        [(3.0, True), (1.0, True), (2.0, False), (0.0, False)],
        ["sc", "y"])
    r = stats.auc_rank(hand, "sc", F.col("y")).collect()[0]
    assert r["auc"] == 0.75 and r["n_pos"] == 2 and r["n_neg"] == 2


def test_calibration_table_perfect_and_miscalibrated(spark):
    # perfectly calibrated scorer: within each bin frac_pos tracks
    # the score; Brier sums to p(1-p)-ish. Use score == label
    # probability exactly: score 0.2 bin -> 20% positives
    rows = []
    for b10, frac in ((2, 0.2), (8, 0.8)):
        sc = b10 / 10.0 + 0.05
        n = 100
        rows += [(sc, i < int(frac * n)) for i in range(n)]
    df = spark.createDataFrame(rows, ["sc", "y"])
    out = {r["bin"]: r for r in
           stats.calibration_table(df, "sc", F.col("y")).collect()}
    assert set(out) == {2, 8}
    assert out[2]["frac_pos"] == 0.2 and out[8]["frac_pos"] == 0.8
    assert out[2]["mean_score"] == 0.25 and out[8]["mean_score"] == 0.85
    # Brier of this near-calibrated scorer ~= mean of p(1-p) terms
    brier = sum(r["brier_term"] for r in out.values())
    expect = 0.5 * ((0.25 - 1) ** 2 * 0.2 + 0.25 ** 2 * 0.8
                    + (0.85 - 1) ** 2 * 0.8 + 0.85 ** 2 * 0.2)
    assert abs(brier - expect) < 1e-6
    # score 1.0 lands in the top bin (LEAST clamp), not bin 10
    edge = spark.createDataFrame([(1.0, True)], ["sc", "y"])
    assert stats.calibration_table(
        edge, "sc", F.col("y")).collect()[0]["bin"] == 9


def test_gains_table_perfect_ranker(spark):
    # 100 rows, 20 positives all with the top scores: decile 1 and 2
    # capture everything; lift of decile 1 is 5x
    rows = [(float(100 - i), i < 20, i) for i in range(100)]
    df = spark.createDataFrame(rows, ["sc", "y", "id"])
    out = {r["decile"]: r for r in
           stats.gains_table(df, "sc", F.col("y"), "id").collect()}
    assert out[1]["pos"] == 10 and out[2]["pos"] == 10
    assert out[2]["capture"] == 1.0 and out[10]["capture"] == 1.0
    assert out[1]["lift"] == 5.0            # 10/10 vs 20/100 base rate
    assert out[10]["lift"] == 1.0           # full population
    assert out[10]["cum_n"] == 100


def test_qini_planted_uplift_vs_sure_things(spark):
    # score separates a genuine-uplift segment (treat converts 80%,
    # control 10%) from a sure-thing segment (everyone converts):
    # qini climbs over the high-score deciles and stays ~flat after
    rows = []
    uid = 0
    for i in range(200):  # high score: real uplift
        t = i % 2 == 0
        y = (i % 10 < 8) if t else (i % 10 < 1)
        rows.append((uid, 100.0, t, y)); uid += 1
    for i in range(200):  # low score: sure things, zero uplift
        rows.append((uid, 1.0, i % 2 == 0, True)); uid += 1
    df = spark.createDataFrame(rows, ["id", "sc", "t", "y"])
    out = {r["decile"]: r for r in stats.qini_table(
        df, "sc", F.col("t"), F.col("y"), "id", deciles=4).collect()}
    # deciles 1-2 hold the uplift segment: qini ~ (0.8-0.1)*100 = 70
    assert out[2]["qini"] > 50
    # sure-thing tail adds ~nothing: final qini ~= mid qini
    assert abs(out[4]["qini"] - out[2]["qini"]) < 15
    # exposure bookkeeping
    assert out[4]["cum_n_t"] + out[4]["cum_n_c"] == 400


def test_spearman_monotone_ties_and_scipy_free_check(spark):
    # perfect monotone (nonlinear) relation -> exactly 1.0
    mono = spark.createDataFrame(
        [(float(i), float(i ** 3)) for i in range(1, 20)], ["a", "b"])
    assert stats.spearman_corr(mono, "a", "b") \
        .collect()[0]["spearman"] == 1.0
    # reversed -> -1.0
    rev = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(1, 20)], ["a", "b"])
    assert stats.spearman_corr(rev, "a", "b") \
        .collect()[0]["spearman"] == -1.0
    # hand case with ties: a=[1,2,2,3], b=[1,3,2,4]
    # avg ranks a: 1, 2.5, 2.5, 4 ; b: 1, 3, 2, 4 -> pearson(ranks)
    tied = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (3.0, 4.0)], ["a", "b"])
    r = stats.spearman_corr(tied, "a", "b").collect()[0]
    import math
    ra, rb = [1, 2.5, 2.5, 4], [1, 3, 2, 4]
    n = 4
    num = n * sum(x * y for x, y in zip(ra, rb)) - sum(ra) * sum(rb)
    den = math.sqrt((n * sum(x * x for x in ra) - sum(ra) ** 2)
                    * (n * sum(y * y for y in rb) - sum(rb) ** 2))
    assert r["spearman"] == pytest.approx(round(num / den, 6), abs=1e-9)
    assert r["n"] == 4
