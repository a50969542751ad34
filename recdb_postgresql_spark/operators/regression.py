"""Closed-form linear regression — ML as one aggregate.

PG ships the one-feature family (``regr_slope``/``regr_intercept``,
mirrored in the statistical-aggregates query); this module is the
multi-feature extension done the distributed-systems way: ordinary
least squares reduces to a MOMENT MATRIX (n, Σx_i, Σx_i x_j, Σx_i y)
— one map-combined aggregate producing a single row, independent of
row count — and a p x p solve on that row. Unlike every iterative
model here (SVD, ALS, L-BFGS, Lloyd), the solution is CLOSED-FORM:
two engines computing the same moments get the same coefficients, so
``ols_fit_sql`` (p <= 2 features, Cramer's rule spelled out in
Catalyst expressions) is fully DuckDB-oracle-checkable — a trained
model with a value-hash parity gate.

``ols_fit`` generalizes to any p by solving the p x p system with
numpy on the collected single moment row (model metadata, like
centroids) — still deterministic, but float op order differs from an
in-SQL solve, so it takes the rows-only lane.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moments(df: DataFrame, y_col: str, x_cols: Sequence[str]):
    """One aggregate: n, S_i, S_ij (i<=j), Sy, S_iy, Syy.

    Cross moments use the separator alias ``s{i}_{j}`` — the plain
    ``s{i}{j}`` scheme collides for p >= 13 (s12 = sum(x12) vs
    s1_2 = sum(x1*x2)) and Spark resolves duplicate aliases to the
    first silently (ADVICE r7)."""
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    aggs = [F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(y).alias("sy"), F.sum(y * y).alias("syy")]
    for i, xi in enumerate(xs):
        aggs.append(F.sum(xi).alias(f"s{i}"))
        aggs.append(F.sum(xi * y).alias(f"s{i}y"))
        for j, xj in enumerate(xs):
            if i <= j:
                aggs.append(F.sum(xi * xj).alias(f"s{i}_{j}"))
    keep = y.isNotNull()
    for xi in xs:
        keep = keep & xi.isNotNull()
    return df.where(keep).agg(*aggs)


def ols_fit_sql(df: DataFrame, y_col: str,
                x_cols: Sequence[str]) -> DataFrame:
    """One-row (b0, b1[, b2], r2): OLS with intercept for EXACTLY one
    or two features, Cramer's rule written out as Catalyst expressions
    over the moment row — no collect, no iteration, and the identical
    formula runs in the SQL oracle. NULL rows (in y or any x) are
    excluded, like every SQL aggregate. R² = 1 - SSE/SST with
    SSE = Syy - b·X'y (the standard moment identity)."""
    p = len(x_cols)
    if p not in (1, 2):
        raise ValueError("ols_fit_sql supports 1 or 2 features "
                         "(Cramer's rule in-plan) — use ols_fit for "
                         "general p")
    m = _moments(df, y_col, x_cols)
    n, sy, syy = F.col("n"), F.col("sy"), F.col("syy")
    if p == 1:
        s0, s00, s0y = F.col("s0"), F.col("s0_0"), F.col("s0y")
        det = n * s00 - s0 * s0
        b0 = (sy * s00 - s0 * s0y) / det
        b1 = (n * s0y - s0 * sy) / det
        sse = syy - (b0 * sy + b1 * s0y)
        sst = syy - sy * sy / n
        return m.select(F.round(b0, 6).alias("b0"),
                        F.round(b1, 6).alias("b1"),
                        F.round(1 - sse / sst, 6).alias("r2"))
    s0, s1 = F.col("s0"), F.col("s1")
    s00, s01, s11 = F.col("s0_0"), F.col("s0_1"), F.col("s1_1")
    s0y, s1y = F.col("s0y"), F.col("s1y")
    # A = [[n, s0, s1], [s0, s00, s01], [s1, s01, s11]],
    # c = [sy, s0y, s1y]; 3x3 determinants expanded along row 1
    det = (n * (s00 * s11 - s01 * s01)
           - s0 * (s0 * s11 - s01 * s1)
           + s1 * (s0 * s01 - s00 * s1))
    det0 = (sy * (s00 * s11 - s01 * s01)
            - s0 * (s0y * s11 - s01 * s1y)
            + s1 * (s0y * s01 - s00 * s1y))
    det1 = (n * (s0y * s11 - s01 * s1y)
            - sy * (s0 * s11 - s01 * s1)
            + s1 * (s0 * s1y - s0y * s1))
    det2 = (n * (s00 * s1y - s0y * s01)
            - s0 * (s0 * s1y - s0y * s1)
            + sy * (s0 * s01 - s00 * s1))
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    sse = syy - (b0 * sy + b1 * s0y + b2 * s1y)
    sst = syy - sy * sy / n
    return m.select(F.round(b0, 6).alias("b0"),
                    F.round(b1, 6).alias("b1"),
                    F.round(b2, 6).alias("b2"),
                    F.round(1 - sse / sst, 6).alias("r2"))


def ols_fit(df: DataFrame, y_col: str, x_cols: Sequence[str],
            ridge: float = 0.0) -> tuple[np.ndarray, float]:
    """General-p OLS (optionally RIDGE): the same single moment-row
    aggregate, solved driver-side with numpy (p x p — microseconds;
    the DATA never leaves executors). ``ridge`` adds the standard L2
    penalty to the feature block of the normal equations (the
    intercept is not penalized) — the first knob a user reaches for
    when features are collinear and Cramer's determinant heads to 0.
    Returns (coefficients [b0, b1..bp], r2 — computed from the true
    residual quadratic form, exact for any ridge). Deterministic, but
    the solver's float op order differs from the in-SQL Cramer path —
    rows-only lane, like KMeans centroids."""
    row = _moments(df, y_col, x_cols).collect()[0]
    p = len(x_cols)
    a = np.zeros((p + 1, p + 1))
    c = np.zeros(p + 1)
    a[0, 0], c[0] = row["n"], row["sy"]
    for i in range(p):
        a[0, i + 1] = a[i + 1, 0] = row[f"s{i}"]
        c[i + 1] = row[f"s{i}y"]
        for j in range(p):
            if i <= j:
                a[i + 1, j + 1] = a[j + 1, i + 1] = row[f"s{i}_{j}"]
    reg = a.copy()
    reg[1:, 1:] += float(ridge) * np.eye(p)
    b = np.linalg.solve(reg, c)
    # SSE = y'y - 2 b'X'y + b'(X'X)b — exact for ridge too (the
    # b'c shortcut only holds when b solves the UNregularized system)
    sse = row["syy"] - 2.0 * float(b @ c) + float(b @ a @ b)
    sst = row["syy"] - row["sy"] ** 2 / row["n"]
    return b, 1.0 - sse / sst


def theil_sen_grouped(df: DataFrame, group_cols: Sequence[str],
                      x_col: str, y_col: str,
                      round_to: int = 6) -> DataFrame:
    """(group..., slope, intercept): Theil-Sen per group — the robust
    per-entity trend report (per-type daily drift, per-user spend
    trajectory) a monitoring pipeline runs over thousands of keys at
    once. Same estimator as ``theil_sen``; the pair join is an
    EQUI-join on the group columns, so cost is Σ_g n_g² — bounded by
    the per-group series length (fit aggregated rollups, as with the
    ungrouped form), never by group count. Groups with a single point
    (no pairs) are omitted, like SQL's regr_slope returning NULL.

    Guarded like the plain form: the equi-join pair blowup is
    Σ_g n_g², and ONE fat group is the AQE-invisible CPU-heavy stage
    SCALING.md warns about (the join output is byte-proportional per
    group, so AQE never splits it). A cheap pre-count (group-count
    rows) raises when any single group exceeds the same ``2**22``
    pair budget the ungrouped form enforces — pre-aggregate that
    series into buckets first, which is the intended shape."""
    gcols = list(group_cols)
    pts = (df.select(*gcols,
                     F.col(x_col).cast("double").alias("x"),
                     F.col(y_col).cast("double").alias("y"))
           .where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()))
    fat = (pts.groupBy(*gcols).agg(F.count(F.lit(1)).alias("_n"))
           .agg(F.max("_n").alias("_m")).collect()[0]["_m"]) or 0
    if fat * fat > 2 ** 22:
        raise ValueError(
            f"theil_sen_grouped is exact-quadratic PER GROUP and the "
            f"fattest group has {fat} points ({fat}^2 pairs > 2^22): "
            "aggregate that group's series into buckets first (the "
            "intended shape)")
    a = pts.select(*gcols, F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = pts.select(*gcols, F.col("x").alias("x2"), F.col("y").alias("y2"))
    slopes = (a.join(b, gcols)
              .where(F.col("x1") < F.col("x2"))
              .groupBy(*gcols)
              .agg(F.expr("percentile((y2 - y1) / (x2 - x1), 0.5)")
                   .alias("_slope")))
    resid = (pts.join(slopes, gcols)
             .groupBy(*gcols, "_slope")
             .agg(F.expr("percentile(y - _slope * x, 0.5)")
                  .alias("_icept")))
    return resid.select(*gcols,
                        F.round("_slope", round_to).alias("slope"),
                        F.round("_icept", round_to).alias("intercept"))


def theil_sen(df: DataFrame, x_col: str, y_col: str,
              round_to: int = 6) -> DataFrame:
    """One-row (slope, intercept): Theil-Sen ROBUST regression — the
    median of all pairwise slopes (y_j-y_i)/(x_j-x_i), then intercept
    = median(y - slope*x). Breakdown point ~29%: a few wild outlier
    points move OLS arbitrarily but barely move Theil-Sen — the
    estimator a monitoring pipeline wants for trend-on-dirty-data.

    Exactness/parity: both medians are continuous quantiles (linear
    interpolation — Spark ``percentile`` == DuckDB ``median``), all
    arithmetic double, rounded at the end, so the fitted model
    hash-checks cross-engine like ols_fit_sql.

    Scale shape: pairwise slopes are O(n^2) — this operator is meant
    for AGGREGATED series (fit a daily/hourly rollup: n = #buckets,
    pairs = #buckets^2, both tiny and independent of event count;
    the composition q_events_theilsen_daily demonstrates it). For a
    large raw n, pre-aggregate or sample x-strata first; a silent
    guard raises past ``2**22`` pair rows to keep the quadratic
    explicit."""
    pts = df.select(F.col(x_col).cast("double").alias("x"),
                    F.col(y_col).cast("double").alias("y")) \
        .where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    n = pts.count()
    if n * n > 2 ** 22:
        raise ValueError(
            f"theil_sen is exact-quadratic ({n}^2 pairs): aggregate "
            "the series into buckets first (the intended shape)")
    a = pts.select(F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = pts.select(F.col("x").alias("x2"), F.col("y").alias("y2"))
    slopes = (a.crossJoin(F.broadcast(b))
              .where(F.col("x1") < F.col("x2"))
              .select(((F.col("y2") - F.col("y1"))
                       / (F.col("x2") - F.col("x1"))).alias("s")))
    slope = slopes.agg(F.expr("percentile(s, 0.5)").alias("slope"))
    resid = pts.crossJoin(F.broadcast(slope)) \
        .select("slope", (F.col("y") - F.col("slope") * F.col("x"))
                .alias("r"))
    return (resid.groupBy("slope")
            .agg(F.expr("percentile(r, 0.5)").alias("intercept"))
            .select(F.round("slope", round_to).alias("slope"),
                    F.round("intercept", round_to).alias("intercept")))


def ols_by_group(df: DataFrame, group_cols, x, y,
                 min_n: int = 3) -> DataFrame:
    """(…group_cols, n, slope, intercept, r2): per-group SIMPLE
    linear regression in ONE aggregation pass — the closed form
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over algebraic sums,
    the grouped companion to ``ols_fit_sql`` (multi-feature, single
    fit) and ``theil_sen_grouped`` (robust). Groups with fewer than
    ``min_n`` points or zero x-variance drop (their fit is
    undefined). Everything collapses map-side; output is group-count
    rows."""
    cols = list(group_cols)
    xs, ys = x.cast("double"), y.cast("double")
    agg = (df.where(xs.isNotNull() & ys.isNotNull())
           .groupBy(*cols)
           .agg(F.count(F.lit(1)).cast("double").alias("n"),
                F.sum(xs).alias("sx"), F.sum(ys).alias("sy"),
                F.sum(xs * xs).alias("sxx"),
                F.sum(xs * ys).alias("sxy"),
                F.sum(ys * ys).alias("syy")))
    den = agg["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (agg["n"] * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    intercept = (F.col("sy") - slope * F.col("sx")) / agg["n"]
    sst = F.col("syy") - F.col("sy") * F.col("sy") / agg["n"]
    ssr = slope * (F.col("sxy") - F.col("sx") * F.col("sy") / agg["n"])
    return (agg.where((F.col("n") >= min_n) & (den > 0))
            .select(*cols, F.col("n").cast("long").alias("n"),
                    F.round(slope, 6).alias("slope"),
                    F.round(intercept, 6).alias("intercept"),
                    F.round(ssr / sst, 6).alias("r2")))
