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
