"""r13 optimization round: new knobs must be value-identical.

- RECDB_CF_MATERIALIZE flips the on-the-fly RECOMMEND plan between
  the lazy duplicated-subtree form (local default) and the shared
  materialized form (cluster policy) — same rows under every policy.
- materialize() is the storage-policy helper behind it.
- cms_build(weight_col=) drops NULL/non-positive weights so the
  raw == pre-aggregated identity holds on arbitrary inputs.
"""

import os

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.engine import RecEngine
from recdb_postgresql_spark.functions.mat import materialize
from recdb_postgresql_spark.functions.sketch import cms_build


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def events(spark):
    data = [(u, (u * 7 + i * 3) % 5, float(50 + (u * i) % 40))
            for u in range(8) for i in range(6)]
    return spark.createDataFrame(data, "userid long, itemid long, val double")


@pytest.fixture()
def _restore_policy():
    prev = os.environ.get("RECDB_CF_MATERIALIZE")
    yield
    if prev is None:
        os.environ.pop("RECDB_CF_MATERIALIZE", None)
    else:
        os.environ["RECDB_CF_MATERIALIZE"] = prev


@pytest.mark.parametrize("method", ["itemcoscf", "itempearcf",
                                    "usercoscf", "userpearcf"])
def test_cf_materialize_policy_identical(spark, events, method,
                                         _restore_policy):
    """recommend() rows are identical under every materialization
    policy — the knob changes WHERE shared frames are stored, never
    what any leg computes."""
    out = {}
    for policy in ("none", "local", "disk"):
        os.environ["RECDB_CF_MATERIALIZE"] = policy
        eng = RecEngine(spark, verbose_queries=False)
        df = eng.recommend(events, "userid", "itemid", "val", method,
                           user_where=F.col("userid") < 4, round_to=6)
        out[policy] = _rows(df)
    assert out["none"] == out["local"] == out["disk"]
    assert len(out["none"]) > 0


def test_materialize_modes(spark):
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    assert materialize(df, storage="none") is df
    for mode in ("local", "disk"):
        m = materialize(df, storage=mode)
        assert _rows(m) == _rows(df)
    with pytest.raises(ValueError):
        materialize(df, storage="bogus")


def test_cms_build_weight_guard(spark):
    """NULL / zero / negative weights are dropped: the sketch equals
    a raw build over only the positively-weighted keys."""
    counts = spark.createDataFrame(
        [(1, 3), (2, None), (3, 0), (4, -2), (5, 1)],
        "k long, c long")
    pre = cms_build(counts, "k", depth=3, width=8, weight_col="c")
    raw_rows = [(1,), (1,), (1,), (5,)]
    raw = cms_build(spark.createDataFrame(raw_rows, "k long"),
                    "k", depth=3, width=8)
    assert _rows(pre) == _rows(raw)
