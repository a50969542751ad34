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
