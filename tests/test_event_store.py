"""Copy-on-write DML surface: INSERT/UPDATE/DELETE + snapshot
isolation for readers pinned to an older version."""

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.sources.event_store import EventStore

SCHEMA = "userid long, itemid long, ratingval double"


@pytest.fixture()
def store(spark, tmp_path):
    s = EventStore(spark, str(tmp_path / "ev"))
    s.append(spark.createDataFrame(
        [(1, 10, 4.0), (1, 20, 2.0), (2, 10, 5.0)], SCHEMA))
    return s


def test_append_is_delta_not_rewrite(spark, store):
    v0 = store.version
    store.append(spark.createDataFrame([(3, 30, 1.0)], SCHEMA))
    assert store.read().count() == 4
    assert store.version == v0 + 1


def test_delete_where(spark, store):
    store.delete(F.col("userid") == 1)
    rows = {(r.userid, r.itemid) for r in store.read().collect()}
    assert rows == {(2, 10)}


def test_update_set_where(spark, store):
    store.update({"ratingval": F.col("ratingval") + 1.0},
                 F.col("itemid") == 10)
    vals = {(r.userid, r.itemid): r.ratingval for r in store.read().collect()}
    assert vals[(1, 10)] == 5.0 and vals[(2, 10)] == 6.0
    assert vals[(1, 20)] == 2.0  # untouched


def test_snapshot_isolation(spark, store):
    before = store.read()       # pins the pre-delete snapshot dirs
    store.delete(F.col("userid") == 1)
    assert before.count() == 3  # old reader still sees all rows
    assert store.read().count() == 1


def test_empty_store_read_raises(spark, tmp_path):
    s = EventStore(spark, str(tmp_path / "none"))
    with pytest.raises(ValueError, match="empty"):
        s.read()


def test_delete_null_predicate_keeps_row(spark, tmp_path):
    """SQL DELETE ... WHERE removes only rows where the predicate is
    TRUE; a NULL predicate (NULL in the column) must keep the row."""
    s = EventStore(spark, str(tmp_path / "ev"))
    s.append(spark.createDataFrame(
        [(1, 10, 4.0), (2, None, 2.0), (3, 30, 1.0)],
        "userid long, itemid long, ratingval double"))
    s.delete(F.col("itemid") == 10)      # NULL == 10 is NULL, not TRUE
    rows = {r.userid for r in s.read().collect()}
    assert rows == {2, 3}


def test_store_append_triggers_threshold_retrain(spark, tmp_path):
    """nodeModifyTable.c:271 surface: INSERTs through the store bump
    the bound recommender's counter and retrain past the threshold,
    with NO manual append_events call."""
    from recdb_postgresql_spark.engine import RecEngine

    base = spark.createDataFrame(
        [(u, i, float((u * 7 + i * 3) % 5 + 1))
         for u in range(4) for i in range(10, 16)],
        "userid long, itemid long, ratingval double")
    s = EventStore(spark, str(tmp_path / "ev"))
    s.append(base)
    eng = RecEngine(spark, update_threshold=0.5)
    eng.create_recommender("storebound", s.read(), "userid", "itemid",
                           "ratingval", "itemcoscf", events_name="events")
    s.bind_recommender(eng, "storebound")

    info = eng.catalog.get("storebound")
    total0 = info.event_total
    # below threshold: counter bumps, no retrain
    s.append(spark.createDataFrame([(9, 10, 5.0)],
                                   "userid long, itemid long, ratingval double"))
    info = eng.catalog.get("storebound")
    assert info.update_counter == 1 and info.event_total == total0
    # crossing threshold: retrain + counter reset + event_total advance
    many = spark.createDataFrame(
        [(20 + u, 10 + (u % 6), 3.0) for u in range(total0)],
        "userid long, itemid long, ratingval double")
    s.append(many)
    info = eng.catalog.get("storebound")
    assert info.update_counter == 0
    assert info.event_total == total0 + 1 + total0
    # the retrained model covers the appended users
    out = eng.recommend(s.read(), "userid", "itemid", "ratingval",
                        name="storebound",
                        user_where=F.col("userid") == 20, k=3)
    assert out.count() == 3


def test_bind_unknown_recommender_raises(spark, tmp_path):
    from recdb_postgresql_spark.engine import RecEngine

    s = EventStore(spark, str(tmp_path / "ev2"))
    with pytest.raises(ValueError, match="no recommender"):
        s.bind_recommender(RecEngine(spark), "ghost")
