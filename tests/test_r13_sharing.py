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


@pytest.fixture()
def _restore_mat_storage():
    prev = os.environ.get("RECDB_MAT_STORAGE")
    yield
    if prev is None:
        os.environ.pop("RECDB_MAT_STORAGE", None)
    else:
        os.environ["RECDB_MAT_STORAGE"] = prev


def test_textrank_toks_share_policy_identical(spark, _restore_mat_storage):
    """textrank_keywords' materialized token-position table (one pass
    instead of 2*window duplicated regexp+posexplode legs) is value-
    neutral under every storage policy, tie-breaks included."""
    from recdb_postgresql_spark.operators.text import textrank_keywords

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta alpha gamma epsilon zeta "
             "beta delta " + ("theta iota " * (i % 3)))
         for i in range(12)],
        "doc_id long, text string")
    out = {}
    for policy in ("none", "local", "disk"):
        os.environ["RECDB_MAT_STORAGE"] = policy
        out[policy] = [tuple(r) for r in
                       textrank_keywords(docs, window=2, iterations=4,
                                         k=10).collect()]
    assert out["none"] == out["local"] == out["disk"]
    assert len(out["none"]) > 0


@pytest.mark.parametrize("entry", ["rec_baseline_topk", "rec_popular_topk",
                                   "ann_ivfpq_topk", "rec_item_cooccur"])
def test_entry_mat_policy_identical(spark, entry, _restore_mat_storage):
    """The r13-sweep entries whose shared input frame (normalized
    ratings / unit vectors) is materialized once for their
    driver-collect-serialized consumer legs return identical rows
    under every storage policy."""
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[entry]
    out = {}
    for policy in ("none", "local", "disk"):
        os.environ["RECDB_MAT_STORAGE"] = policy
        out[policy] = sorted(tuple(r) for r in
                             fn(spark, "/root/testdata/sf0.001").collect())
        spark.catalog.clearCache()
    assert out["none"] == out["local"] == out["disk"]
    assert len(out["none"]) > 0
