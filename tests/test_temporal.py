"""as-of join semantics (operators/temporal.py): the union+window plan
must reproduce the declarative "latest right row at or before left.ts
per key" spec, including strict/tolerance/no-match edges."""

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import temporal


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 5, "a"), (4, 20, "b"), (5, 7, "c")],
        "lid long, ts long, k string")
    right = spark.createDataFrame(
        [(101, 8, "a", 1.0), (102, 20, "a", 2.0), (103, 20, "a", 3.0),
         (104, 25, "b", 4.0)],
        "rid long, ts long, k string, v double")
    return left, right


def collect_map(df):
    return {r.lid: (r.v, r.matched_ts) for r in df.collect()}


def test_asof_basic_latest_at_or_before(frames):
    left, right = frames
    out = collect_map(temporal.asof_join(
        left, right, on="k", value_cols=("v",), right_tiebreak="rid"))
    assert out[1] == (1.0, 8)            # 8 <= 10, latest
    # same-instant match visible; tie at ts=20 -> highest rid wins
    assert out[2] == (3.0, 20)
    assert out[3] == (None, None)        # nothing at or before 5
    assert out[4] == (None, None)        # b's only row is later (25)
    assert out[5] == (None, None)        # key c has no right rows


def test_asof_strict_excludes_same_instant(frames):
    left, right = frames
    out = collect_map(temporal.asof_join(
        left, right, on="k", value_cols=("v",), strict=True,
        right_tiebreak="rid"))
    assert out[2] == (1.0, 8)            # ts=20 rows no longer visible


def test_asof_tolerance_nulls_stale_matches(frames):
    left, right = frames
    out = collect_map(temporal.asof_join(
        left, right, on="k", value_cols=("v",), tolerance=1,
        right_tiebreak="rid"))
    assert out[1] == (None, None)        # match at 8 is 2 old > 1
    assert out[2] == (3.0, 20)           # same-instant: staleness 0


def test_asof_preserves_left_rows_and_columns(frames):
    left, right = frames
    out = temporal.asof_join(left, right, on="k", value_cols=("v",),
                             right_tiebreak="rid")
    assert out.count() == left.count()
    assert out.columns == ["lid", "ts", "k", "v", "matched_ts"]


@pytest.mark.parametrize("bucket", [1, 7, 1000])
def test_asof_bucketed_identical_to_flat(frames, bucket):
    """The skew-bounded two-pass variant must reproduce the flat
    window bit-for-bit at every bucket size: 1 (pure cross-bucket
    carry), 7 (mixed within/across), 1000 (everything in one bucket),
    across plain/strict/tolerance modes."""
    left, right = frames
    for kwargs in ({}, {"strict": True}, {"tolerance": 1}):
        flat = collect_map(temporal.asof_join(
            left, right, on="k", value_cols=("v",),
            right_tiebreak="rid", **kwargs))
        bucketed = temporal.asof_join_bucketed(
            left, right, on="k", time_bucket=bucket,
            value_cols=("v",), right_tiebreak="rid", **kwargs)
        assert bucketed.columns == ["lid", "ts", "k", "v", "matched_ts"]
        assert collect_map(bucketed) == flat, (bucket, kwargs)


# ---- interval_join / resample_ffill ----------------------------------


def test_interval_join_basic_and_closed_ends(spark):
    """Closed [start, end]: boundary points included, outside excluded,
    keys never mix; a point in two overlapping intervals matches both."""
    intervals = spark.createDataFrame(
        [(1, "a", 10, 20), (2, "a", 15, 30), (3, "b", 0, 100)],
        "iid long, k string, start_ts long, end_ts long")
    points = spark.createDataFrame(
        [(101, "a", 10), (102, "a", 20), (103, "a", 31), (104, "b", 50),
         (105, "c", 50)],
        "pid long, k string, ts long")
    got = {(r.iid, r.pid) for r in temporal.interval_join(
        points, intervals, on="k", cell=10).collect()}
    assert got == {(1, 101), (1, 102), (2, 102), (3, 104)}


@pytest.mark.parametrize("cell", [3, 10, 50, 1000])
def test_interval_join_cell_size_invariant_vs_bruteforce(spark, cell):
    """EXACT at every cell size (cell only moves cost): matches the
    brute-force BETWEEN filter on random intervals/points."""
    import random

    rng = random.Random(7)
    ivs = [(i, rng.choice("xy"), (s := rng.randrange(0, 200)),
            s + rng.randrange(0, 40)) for i in range(30)]
    pts = [(100 + i, rng.choice("xy"), rng.randrange(0, 240))
           for i in range(60)]
    intervals = spark.createDataFrame(
        ivs, "iid long, k string, start_ts long, end_ts long")
    points = spark.createDataFrame(pts, "pid long, k string, ts long")
    got = {(r.iid, r.pid) for r in temporal.interval_join(
        points, intervals, on="k", cell=cell).collect()}
    brute = {(iid, pid) for iid, ik, s, e in ivs
             for pid, pk, t in pts if ik == pk and s <= t <= e}
    assert got == brute and got


def test_interval_join_plan_is_equi_join(spark):
    """The whole point: no cross product / nested-loop range join —
    the BETWEEN must be a residual filter on a hash/sort equi-join."""
    intervals = spark.createDataFrame(
        [(1, "a", 10, 20)], "iid long, k string, start_ts long, end_ts long")
    points = spark.createDataFrame([(101, "a", 10)],
                                   "pid long, k string, ts long")
    plan = temporal.interval_join(points, intervals, on="k", cell=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_resample_ffill_gaps_counts_and_carry(spark):
    """Dense spine first->last bucket per key, gap buckets n_events=0,
    last-in-bucket value (by ts then tiebreak) carried forward."""
    ev = spark.createDataFrame(
        [(1, "a", 5, 10.0), (2, "a", 9, 20.0),    # bucket 0: last is id2
         (3, "a", 35, 30.0),                       # bucket 3 (gap 1-2)
         (4, "b", 12, 7.0)],
        "event_id long, k string, ts long, value double")
    out = {(r.k, r.bucket_start): (r.n_events, r.value)
           for r in temporal.resample_ffill(
               ev, on="k", bucket=10, tiebreak="event_id").collect()}
    assert out == {
        ("a", 0): (2, 20.0),    # ts=9 beats ts=5
        ("a", 10): (0, 20.0),   # gap: carried
        ("a", 20): (0, 20.0),
        ("a", 30): (1, 30.0),
        ("b", 10): (1, 7.0),    # spine never crosses keys
    }


def test_resample_ffill_tiebreak_deterministic(spark):
    """Equal ts within a bucket: highest tiebreak wins (same contract
    as asof_join's right_tiebreak)."""
    ev = spark.createDataFrame(
        [(1, "a", 5, 10.0), (2, "a", 5, 99.0)],
        "event_id long, k string, ts long, value double")
    [r] = temporal.resample_ffill(ev, on="k", bucket=10,
                                  tiebreak="event_id").collect()
    assert (r.n_events, r.value) == (2, 99.0)


def test_interval_join_tolerates_shared_column_names(spark):
    """Intervals derived from events often keep their raw ts column —
    the residual must resolve against the points side, not throw
    AMBIGUOUS_REFERENCE."""
    intervals = spark.createDataFrame(
        [(1, "a", 20, 10, 20)],
        "iid long, k string, ts long, start_ts long, end_ts long")
    points = spark.createDataFrame(
        [(101, "a", 15), (102, "a", 25)], "pid long, k string, ts long")
    got = {(r.iid, r.pid) for r in temporal.interval_join(
        points, intervals, on="k", cell=10).collect()}
    assert got == {(1, 101)}


def test_interval_overlap_basic_no_duplicates(spark):
    """Overlapping pairs found once each (even when they share many
    cells), touching endpoints count, disjoint/cross-key pairs don't."""
    left = spark.createDataFrame(
        [(1, "a", 0, 100), (2, "a", 200, 210), (3, "b", 0, 50)],
        "lid long, k string, start_ts long, end_ts long")
    right = spark.createDataFrame(
        [(11, "a", 90, 205),    # overlaps 1 (many shared cells) AND 2
         (12, "a", 100, 150),   # touches 1 at exactly 100
         (13, "a", 101, 150),   # disjoint from 1
         (14, "b", 300, 400)],  # same key, disjoint
        "rid long, k string, start_ts long, end_ts long")
    rows = temporal.interval_overlap_join(left, right, on="k",
                                          cell=10).collect()
    got = sorted((r.lid, r.rid) for r in rows)
    assert got == [(1, 11), (1, 12), (2, 11)]   # each pair exactly once


@pytest.mark.parametrize("cell", [3, 10, 50, 1000])
def test_interval_overlap_cell_invariant_vs_bruteforce(spark, cell):
    import random

    rng = random.Random(17)
    mk = lambda base: [(base + i, rng.choice("xy"),
                        (s := rng.randrange(-50, 150)),
                        s + rng.randrange(0, 40)) for i in range(25)]
    ls, rs = mk(0), mk(100)
    left = spark.createDataFrame(
        ls, "lid long, k string, start_ts long, end_ts long")
    right = spark.createDataFrame(
        rs, "rid long, k string, start_ts long, end_ts long")
    rows = temporal.interval_overlap_join(left, right, on="k",
                                          cell=cell).collect()
    got = sorted((r.lid, r.rid) for r in rows)
    brute = sorted((lid, rid)
                   for lid, lk, lsrt, lend in ls
                   for rid, rk, rsrt, rend in rs
                   if lk == rk and lsrt <= rend and rsrt <= lend)
    assert got == brute and len(got) == len(set(got))


def test_interval_overlap_plan_is_equi_join_even_self_joined(spark):
    """The overlap join stays an equi-join with residual filters even
    in the self-join shape (both sides derived from one frame) — no
    cross product, no nested-loop range join, no distinct pass."""
    win = spark.createDataFrame(
        [(1, "a", 0, 10), (2, "a", 5, 15)],
        "iid long, k string, start_ts long, end_ts long")
    left = win.select("k", win.iid.alias("lid"), "start_ts", "end_ts")
    right = win.select("k", win.iid.alias("rid"), "start_ts", "end_ts")
    df = temporal.interval_overlap_join(left, right, on="k", cell=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Deduplicate" not in plan and "Distinct" not in plan


def test_interval_join_rejects_reserved_internal_names(spark):
    """Inputs carrying the joins' internal column names would be
    silently overwritten/dropped — must refuse loudly instead."""
    bad = spark.createDataFrame([(1, "a", 5, 0)],
                                "pid long, k string, ts long, _pts long")
    iv = spark.createDataFrame([(1, "a", 0, 10)],
                               "iid long, k string, start_ts long, end_ts long")
    with pytest.raises(ValueError, match="_pts"):
        temporal.interval_join(bad, iv, on="k", cell=10)


def test_ewma_matches_pandas(spark):
    """ewma_smooth == pandas ewm(alpha, adjust=True).mean() whenever
    the lookback window covers the whole series."""
    import pandas as pd

    vals = [10.0, 12.0, 9.5, 11.0, 13.5, 8.0, 10.5]
    rows = [(i, 1, i * 100, vals[i]) for i in range(len(vals))]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double")
    out = temporal.ewma_smooth(df, alpha=0.3, window=20)
    got = {r.event_id: r.ewma for r in out.collect()}
    exp = pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()
    for i in range(len(vals)):
        assert abs(got[i] - round(exp[i], 6)) <= 1e-6, (i, got[i], exp[i])


def test_ewma_window_truncates_and_keys_separate(spark):
    """A 2-row lookback only sees the current and previous row, and
    keys never mix."""
    rows = [(0, 1, 0, 4.0), (1, 1, 100, 8.0), (2, 1, 200, 1.0),
            (3, 2, 0, 100.0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double")
    got = {r.event_id: r.ewma
           for r in temporal.ewma_smooth(df, alpha=0.5, window=2).collect()}
    assert got[0] == 4.0                       # head: only itself
    assert got[1] == round((8.0 + 0.5 * 4.0) / 1.5, 6)
    assert got[2] == round((1.0 + 0.5 * 8.0) / 1.5, 6)   # row 0 aged out
    assert got[3] == 100.0                     # other key untouched


def test_debounce_predecessor_rule(spark):
    """Gap-to-raw-predecessor rule: within a burst every event closer
    than the window to the one right before it is dropped; a quiet gap
    re-admits. Keys never interact."""
    rows = [(0, 1, "c", 0), (1, 1, "c", 50), (2, 1, "c", 90),
            (3, 1, "c", 300), (4, 1, "c", 349),
            (5, 2, "c", 10)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long")
    kept = {r.event_id for r in
            temporal.debounce_events(df, window_ns=100).collect()}
    # 1 (gap 50) and 2 (gap 40) and 4 (gap 49) dropped; 3 kept (gap 210)
    assert kept == {0, 3, 5}


def test_seasonal_decompose_recovers_planted_signal(spark):
    """y = 10*bucket (linear trend) + planted period-4 seasonal
    pattern: the decomposition must recover the centered seasonal
    component and leave ~zero residual; the first/last half-period
    have NULL trend (incomplete window), like classical
    decomposition."""
    import math

    from recdb_postgresql_spark.operators.temporal import seasonal_decompose

    seas = {0: 5.0, 1: -2.0, 2: -4.0, 3: 1.0}   # sums to 0 (centered)
    rows = [("k", b, 10.0 * b + seas[b % 4]) for b in range(40)]
    df = spark.createDataFrame(rows, "k string, bucket long, y double")
    out = {r.bucket: r for r in
           seasonal_decompose(df, ["k"], "bucket", "y",
                              period=4).collect()}
    assert len(out) == 40
    half = 2
    for b in range(40):
        r = out[b]
        if b < half or b >= 40 - half:
            assert r.trend is None and r.residual is None
        else:
            # 5-point centered MA of a linear trend is exact; the
            # period-4 seasonal does not cancel exactly in a 5-point
            # window (one phase repeats), so allow its bounded bias
            assert abs(r.trend - 10.0 * b) <= 1.3
            assert abs(r.seasonal - seas[b % 4]) <= 1.2
            assert abs(r.residual) <= 2.0
    # seasonal components centered: one value per phase, sums ~0
    phases = {b % 4: out[b].seasonal for b in range(half, 38)}
    assert abs(sum(phases.values())) < 1e-6


def test_changepoint_scores_planted_shift(spark):
    """A level shift of +100 at bucket 10 scores ~100 exactly AT the
    boundary and decays away from it; edges (incomplete windows) are
    NULL; a flat series scores 0 everywhere interior."""
    from recdb_postgresql_spark.operators import temporal

    rows = [("a", b, 10.0 if b < 10 else 110.0) for b in range(20)]
    s = spark.createDataFrame(rows, "k string, bucket long, y double")
    got = {r["bucket"]: r for r in temporal.changepoint_scores(
        s, ["k"], "bucket", "y", window=4).collect()}
    assert got[0]["shift_score"] is None  # left side incomplete
    assert got[19]["shift_score"] is None
    # at bucket 9: left = buckets 5-8 (all 10), right = 10-13 (all 110)
    assert got[9]["shift_score"] == 100.0
    assert got[9]["left_mean"] == 10.0 and got[9]["right_mean"] == 110.0
    # far from the boundary the score is 0
    assert got[5]["shift_score"] == 0.0
    # decays linearly approaching it: bucket 7 right = {10,10,110,110}
    assert got[7]["shift_score"] == 50.0


def test_holt_forecast_linear_ramp_is_exact(spark):
    """On a perfectly linear series the Holt recursion locks the trend
    at init and never errs: yhat_t == y_t for every t >= 2 (a sharp
    algebraic pin — any off-by-one in the state update breaks it)."""
    from recdb_postgresql_spark.operators import temporal

    rows = [("a", t, 5.0 + 3.0 * t) for t in range(30)]
    s = spark.createDataFrame(rows, "k string, bucket long, y double")
    out = temporal.holt_forecast(s, ["k"], "bucket", "y",
                                 alpha=0.3, beta=0.1).collect()
    assert len(out) == 29
    for r in out:
        assert r["yhat"] == r["y"], (r["bucket"], r["y"], r["yhat"])


def test_holt_forecast_hand_recursion(spark):
    """Three-point hand check, alpha=0.5, beta=0.5:
    y = [10, 20, 14]; l1=10, b1=10 -> yhat2 = 20;
    l2 = .5*20+.5*20 = 20, b2 = .5*10+.5*10 = 10 -> yhat3 = 30."""
    from recdb_postgresql_spark.operators import temporal

    s = spark.createDataFrame([("a", 1, 10.0), ("a", 2, 20.0),
                               ("a", 3, 14.0)],
                              "k string, bucket long, y double")
    got = {r["bucket"]: r["yhat"]
           for r in temporal.holt_forecast(s, ["k"], "bucket", "y",
                                           alpha=0.5, beta=0.5).collect()}
    assert got == {2: 20.0, 3: 30.0}


def test_holt_forecast_short_keys_drop(spark):
    from recdb_postgresql_spark.operators import temporal

    s = spark.createDataFrame([("solo", 1, 10.0), ("b", 1, 1.0),
                               ("b", 2, 2.0)],
                              "k string, bucket long, y double")
    out = temporal.holt_forecast(s, ["k"], "bucket", "y").collect()
    assert [r["k"] for r in out] == ["b"]


def test_holt_winters_exact_tracking_on_trend_plus_seasonal(spark):
    """On a series that IS level + m*trend-steps + seasonal, the
    classical init recovers (l, b, s) exactly and every one-step
    forecast equals the actual bit-for-bit — the triple-smoothing
    analog of the Holt linear-ramp pin."""
    from recdb_postgresql_spark.operators import temporal

    m, n = 4, 40
    seas = [5.0, -2.0, -4.0, 1.0]  # sums to 0
    rows = [("a", t, 100.0 + 2.0 * t + seas[t % m]) for t in range(n)]
    s = spark.createDataFrame(rows, "k string, bucket long, y double")
    out = temporal.holt_winters_forecast(s, ["k"], "bucket", "y",
                                         period=m).collect()
    assert len(out) == n - m
    for r in out:
        assert r["yhat"] == r["y"], (r["bucket"], r["y"], r["yhat"])


def test_holt_winters_hand_recursion(spark):
    """m=2, alpha=beta=gamma=0.5, y=[10,20,10,30]. Detrended init:
    b=(20-15)/2=2.5; l=15+2.5/2=16.25; s=[-3.75, 3.75].
    t=2: yhat=16.25+2.5-3.75=15; l'=.5*(10+3.75)+.5*18.75=16.25;
    b'=.5*0+.5*2.5=1.25; s[0]=.5*(10-16.25)+.5*(-3.75)=-5.
    t=3: yhat=16.25+1.25+3.75=21.25."""
    from recdb_postgresql_spark.operators import temporal

    s = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 1, 20.0), ("a", 2, 10.0), ("a", 3, 30.0)],
        "k string, bucket long, y double")
    got = {r["bucket"]: r["yhat"]
           for r in temporal.holt_winters_forecast(
               s, ["k"], "bucket", "y", period=2, alpha=0.5,
               beta=0.5, gamma=0.5).collect()}
    assert got == {2: 15.0, 3: 21.25}


def test_holt_winters_short_keys_drop(spark):
    from recdb_postgresql_spark.operators import temporal

    s = spark.createDataFrame(
        [("short", t, float(t)) for t in range(3)]
        + [("long", t, float(t)) for t in range(8)],
        "k string, bucket long, y double")
    out = temporal.holt_winters_forecast(s, ["k"], "bucket", "y",
                                         period=2).collect()
    assert {r["k"] for r in out} == {"long"}


def test_acf_planted_period(spark):
    """A strict period-4 impulse series: acf peaks at lag 4 (and 8,
    12), and the dense spine keeps missing buckets as zeros."""
    from recdb_postgresql_spark.operators.temporal import acf
    import pyspark.sql.functions as F
    HOUR = 3600 * 10 ** 9
    # events only in hours 0, 4, 8, ..., 96 (3 per impulse hour)
    rows = [(h * HOUR + i,) for h in range(0, 97, 4) for i in range(3)]
    ev = spark.createDataFrame(rows, ["ts"])
    out = {r["lag"]: r for r in acf(ev, lags=8).collect()}
    assert out[4]["acf"] > 0.9
    assert out[8]["acf"] > 0.8
    assert out[1]["acf"] < 0          # off-phase lags anti-correlate
    assert out[3]["acf"] < 0
    # n_pairs shrink by one per extra lag over the dense 97-hour spine
    assert out[1]["n_pairs"] == 96 and out[8]["n_pairs"] == 89


def test_acf_constant_series_nan_guard(spark):
    """A constant series has zero variance: acf is NULL (try_divide),
    not an ANSI divide-by-zero error, and the row count is still the
    requested lags."""
    from recdb_postgresql_spark.operators.temporal import acf
    HOUR = 3600 * 10 ** 9
    ev = spark.createDataFrame([(h * HOUR,) for h in range(20)], ["ts"])
    out = acf(ev, lags=3).collect()
    assert len(out) == 3
    assert all(r["acf"] is None for r in out)


def test_cusum_identity_matches_textbook_recursion(spark):
    """The closed window form equals the textbook recursion
    S_t = max(0, S_{t-1} + y_t) on a planted step-shift series, and
    the alarm fires after (and only after) the shift."""
    from recdb_postgresql_spark.operators.temporal import cusum_alarm
    HOUR = 3600 * 10 ** 9
    # 40 hours at ~0, then 20 hours shifted up by +3
    vals = [float((-1) ** h) * 0.5 for h in range(40)] \
        + [3.0 + float((-1) ** h) * 0.5 for h in range(20)]
    rows = [(h * HOUR, v) for h, v in enumerate(vals)]
    ev = spark.createDataFrame(rows, ["ts", "value"])
    out = cusum_alarm(ev, slack=0.5, threshold=5.0).collect()
    # python textbook recursion over the same standardized series
    import statistics
    mu = statistics.mean(vals)
    sd = statistics.stdev(vals)
    s_hi = s_lo = 0.0
    for r, v in zip(out, vals):
        z = (v - mu) / sd
        s_hi = max(0.0, s_hi + z - 0.5)
        s_lo = max(0.0, s_lo - z - 0.5)
        assert abs(r["cusum_hi"] - s_hi) < 1e-6, r["b"]
        assert abs(r["cusum_lo"] - s_lo) < 1e-6, r["b"]
    # target = the GLOBAL mean, so the below-target first segment
    # legitimately trips the LOW side; the HIGH side must fire only
    # after the upward shift
    assert not any(r["cusum_hi"] > 5.0 for r in out[:40])
    assert any(r["cusum_hi"] > 5.0 for r in out[40:])
    assert any(r["alarm"] for r in out[40:])
