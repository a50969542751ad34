"""Forecast backtest scores (operators/temporal.forecast_eval):
manual-computation pin, MASE-beats-naive on a trending series, and
the degenerate-denominator contracts."""

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import temporal


def _eval(spark, rows):
    df = spark.createDataFrame(rows, ["k", "bucket", "y", "yhat"])
    return {r["k"]: r for r in
            temporal.forecast_eval(df, ["k"]).collect()}


def test_manual_scores(spark):
    # eval rows (yhat and naive both defined): buckets 2,3
    # y:    10, 12, 11     yhat: -, 11, 13
    # errs |y-yhat|: 1, 2 -> mae 1.5; naive errs |12-10|,|11-12| = 2,1
    rows = [("a", 1, 10.0, None), ("a", 2, 12.0, 11.0),
            ("a", 3, 11.0, 13.0)]
    r = _eval(spark, rows)["a"]
    assert r["n_eval"] == 2 and r["mae"] == 1.5
    assert r["mase"] == 1.0  # (1+2)/(2+1)
    assert r["rmse"] == round((2.5) ** 0.5, 6)
    smape = (2 * 1 / 23 + 2 * 2 / 24) / 2
    assert abs(r["smape"] - smape) < 1e-6


def test_mase_beats_naive_on_linear_trend(spark):
    # perfect linear trend: a trend-aware yhat (here: the true value)
    # scores 0; naive is off by the slope each step -> mase = 0
    rows = [("a", t, float(10 + 3 * t), float(10 + 3 * t) if t > 1
             else None) for t in range(1, 20)]
    r = _eval(spark, rows)["a"]
    assert r["mae"] == 0.0 and r["mase"] == 0.0


def test_mase_null_on_constant_series(spark):
    # naive is perfect on a constant series -> denominator 0 -> NULL
    rows = [("a", t, 5.0, 6.0 if t > 1 else None)
            for t in range(1, 6)]
    r = _eval(spark, rows)["a"]
    assert r["mase"] is None
    assert r["mae"] == 1.0


def test_detect_peaks_semantics(spark):
    # flat series with one spike at t=10 and a plateau at t=20-21
    # (plateau is NOT a strict local max)
    rows = [("a", t, 10.0) for t in range(30)]
    rows[10] = ("a", 10, 100.0)
    rows[20] = ("a", 20, 90.0)
    rows[21] = ("a", 21, 90.0)
    df = spark.createDataFrame(rows, ["k", "bucket", "y"])
    got = temporal.detect_peaks(df, ["k"], w=2).collect()
    assert [(r["bucket"], r["y"]) for r in got] == [(10, 100.0)]


def test_detect_peaks_boundary_counts(spark):
    # a spike at the series end IS a peak (missing leads -> true)
    rows = [("a", t, 10.0) for t in range(49)] + [("a", 49, 100.0)]
    df = spark.createDataFrame(rows, ["k", "bucket", "y"])
    got = temporal.detect_peaks(df, ["k"], w=2).collect()
    assert [(r["bucket"], r["y"]) for r in got] == [(49, 100.0)]
