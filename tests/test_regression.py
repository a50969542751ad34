"""Closed-form OLS: numpy parity, planted-coefficient recovery, the
single-aggregate plan shape, and the SQL vs general-p agreement."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import regression


def _planted(spark, seed=5, n=4000):
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(0, 10, n)
    x1 = rng.uniform(-3, 3, n)
    y = 2.5 + 1.25 * x0 - 0.75 * x1 + rng.normal(scale=0.1, size=n)
    rows = [(float(y[i]), float(x0[i]), float(x1[i])) for i in range(n)]
    return (spark.createDataFrame(rows, "y double, x0 double, x1 double"),
            np.column_stack([np.ones(n), x0, x1]), y)


def test_ols_sql_recovers_planted_coefficients(spark):
    df, X, y = _planted(spark)
    r = regression.ols_fit_sql(df, "y", ["x0", "x1"]).collect()[0]
    assert r.b0 == pytest.approx(2.5, abs=0.02)
    assert r.b1 == pytest.approx(1.25, abs=0.01)
    assert r.b2 == pytest.approx(-0.75, abs=0.01)
    assert r.r2 > 0.99


def test_ols_sql_matches_numpy_lstsq(spark):
    df, X, y = _planted(spark, seed=9)
    r = regression.ols_fit_sql(df, "y", ["x0", "x1"]).collect()[0]
    ref, *_ = np.linalg.lstsq(X, y, rcond=None)
    np.testing.assert_allclose([r.b0, r.b1, r.b2], ref, atol=1e-5)
    # general-p driver-solve path agrees too
    b, r2 = regression.ols_fit(df, "y", ["x0", "x1"])
    np.testing.assert_allclose(b, ref, atol=1e-8)
    assert r2 == pytest.approx(float(r.r2), abs=1e-4)


def test_ols_single_feature_matches_pg_regr(spark):
    """p=1 reduces to PG's regr_slope / regr_intercept — pin against
    Spark's own implementations of those aggregates."""
    df, _, _ = _planted(spark, seed=11)
    r = regression.ols_fit_sql(df, "y", ["x0"]).collect()[0]
    pg = df.agg(F.expr("regr_slope(y, x0)").alias("s"),
                F.expr("regr_intercept(y, x0)").alias("i")).collect()[0]
    assert r.b1 == pytest.approx(pg.s, abs=1e-6)
    assert r.b0 == pytest.approx(pg.i, abs=1e-6)


def test_ols_null_rows_excluded_and_plan_is_one_aggregate(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0, 1.0), (2.0, 2.0, 0.0), (None, 3.0, 1.0),
         (3.0, None, 0.0), (4.0, 4.0, None), (3.0, 3.0, 1.0)],
        "y double, x0 double, x1 double")
    out = regression.ols_fit_sql(df, "y", ["x0", "x1"])
    assert out.count() == 1  # well-defined with 3 clean rows
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # one partial+final aggregate
    assert "Join" not in plan


def test_ols_rejects_unsupported_arity(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "y double, x0 double")
    with pytest.raises(ValueError, match="1 or 2"):
        regression.ols_fit_sql(df, "y", ["x0", "x0", "x0"])


def test_ridge_shrinks_and_matches_sklearn_free_reference(spark):
    """Ridge: coefficients shrink monotonically with the penalty; the
    closed-form matches a direct numpy normal-equations reference."""
    df, X, y = _planted(spark, seed=13)
    b0, _ = regression.ols_fit(df, "y", ["x0", "x1"], ridge=0.0)
    b1, _ = regression.ols_fit(df, "y", ["x0", "x1"], ridge=100.0)
    b2, r2_big = regression.ols_fit(df, "y", ["x0", "x1"], ridge=1e7)
    assert abs(b1[1]) < abs(b0[1]) and abs(b2[1]) < abs(b1[1])
    assert abs(b2[2]) < 0.05           # huge penalty -> near zero
    a = X.T @ X
    a_reg = a.copy()
    a_reg[1:, 1:] += 100.0 * np.eye(2)
    ref = np.linalg.solve(a_reg, X.T @ y)
    np.testing.assert_allclose(b1, ref, atol=1e-8)
    # r2 from the true quadratic form stays in [-inf, 1] and drops
    _, r2_0 = regression.ols_fit(df, "y", ["x0", "x1"], ridge=0.0)
    assert r2_big < r2_0 <= 1.0


def test_theil_sen_ignores_planted_outliers(spark):
    """The estimator's whole point: a clean slope-2 series with 3 wild
    outliers — OLS drags toward them, Theil-Sen stays on the true
    line (breakdown ~29%)."""
    rows = [(float(x), 2.0 * x + 5.0) for x in range(30)]
    rows += [(3.0, 900.0), (11.0, -700.0), (22.0, 1500.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    ts = regression.theil_sen(df, "x", "y").collect()[0]
    assert abs(ts["slope"] - 2.0) < 0.1, ts
    assert abs(ts["intercept"] - 5.0) < 2.0, ts
    ols = regression.ols_fit_sql(df, "y", ["x"]).collect()[0]
    assert abs(ols["b1"] - 2.0) > 1.0      # OLS got dragged


def test_theil_sen_exact_on_clean_line_and_null_safe(spark):
    rows = [(float(x), 3.0 * x - 1.0) for x in range(10)]
    rows += [(None, 5.0), (4.0, None)]     # excluded like any SQL agg
    df = spark.createDataFrame(rows, "x double, y double")
    got = regression.theil_sen(df, "x", "y").collect()[0]
    assert got["slope"] == 3.0 and got["intercept"] == -1.0


def test_theil_sen_quadratic_guard(spark):
    df = spark.range(3000).selectExpr("CAST(id AS DOUBLE) AS x",
                                      "CAST(id * 2 AS DOUBLE) AS y")
    with pytest.raises(ValueError, match="exact-quadratic"):
        regression.theil_sen(df, "x", "y")


def test_theil_sen_grouped_matches_per_group_ungrouped(spark):
    """Grouped == ungrouped run per key; single-point groups omitted."""
    rows = ([("a", float(x), 2.0 * x + 1.0) for x in range(8)]
            + [("b", float(x), -1.0 * x + 4.0) for x in range(6)]
            + [("b", 2.0, 500.0)]            # outlier, shrugged off
            + [("solo", 1.0, 1.0)])          # one point -> no pairs
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r.k: (r.slope, r.intercept) for r in
           regression.theil_sen_grouped(df, ["k"], "x", "y").collect()}
    assert "solo" not in got
    for k in ("a", "b"):
        one = regression.theil_sen(df.where(F.col("k") == k),
                                   "x", "y").collect()[0]
        assert got[k] == (one["slope"], one["intercept"]), k
    assert got["a"] == (2.0, 1.0)
    assert got["b"][0] == -1.0


def test_theil_sen_grouped_fat_group_guard(spark):
    """One group past the 2^22-pair budget raises (r8 verdict task 3);
    the same total rows spread over many groups passes."""
    fat = spark.range(3000).selectExpr(
        "'hot' AS k", "CAST(id AS DOUBLE) AS x",
        "CAST(id * 2 AS DOUBLE) AS y")
    with pytest.raises(ValueError, match="fattest group"):
        regression.theil_sen_grouped(fat, ["k"], "x", "y")
    spread = spark.range(3000).selectExpr(
        "CAST(id % 30 AS STRING) AS k", "CAST(id AS DOUBLE) AS x",
        "CAST(id * 2 AS DOUBLE) AS y")
    assert regression.theil_sen_grouped(
        spread, ["k"], "x", "y").count() == 30


def test_psi_drift_semantics(spark):
    """Identical distributions -> PSI ~ 0; a shifted snapshot ->
    clearly positive; a constant baseline puts everything in bin 0;
    out-of-range new values clamp into edge bins (never dropped)."""
    from recdb_postgresql_spark.operators import profile

    base = spark.createDataFrame([(float(i % 100),) for i in range(1000)],
                                 "value double")
    same = profile.psi_drift(base, base, bins=10).collect()
    assert len(same) == 10
    assert abs(sum(r["psi_term"] for r in same)) < 1e-9

    shifted = spark.createDataFrame(
        [(float(i % 100) + 60.0,) for i in range(1000)], "value double")
    drift = profile.psi_drift(base, shifted, bins=10).collect()
    total = sum(r["psi_term"] for r in drift)
    assert total > 0.25  # "action" threshold
    # values beyond baseline max all clamp into the last bin
    last = next(r for r in drift if r["bin"] == 9)
    assert last["n_new"] > sum(r["n_new"] for r in drift) * 0.5

    const = spark.createDataFrame([(1.0,)] * 50, "value double")
    cb = {r["bin"]: r for r in profile.psi_drift(const, base,
                                                 bins=10).collect()}
    assert cb[0]["n_old"] == 50 and cb[0]["n_new"] == 1000

    import pytest as _pytest
    with _pytest.raises(ValueError):
        profile.psi_drift(base, base, bins=1)


def test_ols_by_group_exact_line_and_guards(spark):
    import pyspark.sql.functions as F
    from recdb_postgresql_spark.operators.regression import ols_by_group
    rows = ([("a", float(x), 2.0 * x + 1.0) for x in range(10)]   # exact line
            + [("b", float(x), 5.0 - x) for x in range(5)]        # slope -1
            + [("c", 1.0, 3.0), ("c", 1.0, 4.0), ("c", 1.0, 5.0)]  # zero var x
            + [("d", 1.0, 1.0), ("d", 2.0, 2.0)])                  # n < 3
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in
           ols_by_group(df, ["g"], F.col("x"), F.col("y")).collect()}
    assert set(out) == {"a", "b"}          # c (no x-variance) and d drop
    assert out["a"]["slope"] == 2.0 and out["a"]["intercept"] == 1.0
    assert out["a"]["r2"] == 1.0
    assert out["b"]["slope"] == -1.0 and out["b"]["r2"] == 1.0
