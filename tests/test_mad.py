"""MAD robust outliers (operators/stats.mad_outliers): planted
outliers flagged, contamination resistance vs the mean/stddev
z-score, and the MAD=0 degenerate-group contract."""

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import stats


def test_mad_flags_planted_outlier(spark):
    vals = [(i, 10.0 + (i % 7) * 0.5) for i in range(100)]
    vals += [(100, 500.0)]  # the outlier
    df = spark.createDataFrame([("g", i, v) for i, v in vals],
                               ["g", "rid", "v"])
    rows = {r["id"]: r for r in
            stats.mad_outliers(df, "g", "v", "rid").collect()}
    assert abs(rows[100]["mz"]) > 3.5
    assert all(abs(r["mz"]) < 3.5 for k, r in rows.items() if k != 100)


def test_mad_resists_contamination(spark):
    # 10% extreme contamination barely moves median/MAD: the clean
    # rows keep |mz| < 3.5 even though mean/std would be dragged
    vals = [(i, float(i % 11)) for i in range(90)]
    vals += [(1000 + i, 1e6) for i in range(10)]
    df = spark.createDataFrame([("g", i, v) for i, v in vals],
                               ["g", "rid", "v"])
    rows = stats.mad_outliers(df, "g", "v", "rid").collect()
    clean = [r for r in rows if r["id"] < 1000]
    dirty = [r for r in rows if r["id"] >= 1000]
    assert all(abs(r["mz"]) < 3.5 for r in clean)
    assert all(abs(r["mz"]) > 3.5 for r in dirty)


def test_mad_zero_is_null(spark):
    df = spark.createDataFrame([("g", i, 5.0) for i in range(10)],
                               ["g", "rid", "v"])
    rows = stats.mad_outliers(df, "g", "v", "rid").collect()
    assert all(r["mz"] is None for r in rows)
