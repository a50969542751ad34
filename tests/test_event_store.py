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


def _files_under(root):
    import os
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[p] = os.path.getmtime(p)
    return out


@pytest.fixture()
def pstore(spark, tmp_path):
    s = EventStore(spark, str(tmp_path / "pev"), partition_col="userid")
    s.append(spark.createDataFrame(
        [(1, 10, 4.0), (1, 20, 2.0), (2, 10, 5.0), (3, 30, 1.0)], SCHEMA))
    return s


def test_partitioned_roundtrip_and_append(spark, pstore):
    assert pstore.read().count() == 4
    pstore.append(spark.createDataFrame([(2, 40, 3.0), (4, 40, 2.0)], SCHEMA))
    rows = {(r.userid, r.itemid) for r in pstore.read().collect()}
    assert (2, 40) in rows and (4, 40) in rows and len(rows) == 6
    # partition column survives as a REAL column (no path inference)
    assert dict(pstore.read().dtypes)["userid"] == "bigint"


def test_partitioned_delete_touches_only_matching_partitions(spark, pstore):
    """The 100 TB property: DELETE WHERE userid=1 must leave every
    other partition's parquet files untouched on disk (same paths,
    same mtimes) — partition-scoped copy-on-write, not a table
    rewrite."""
    import os
    before = _files_under(pstore.path)
    untouched_before = {p: t for p, t in before.items() if "part=1" not in p}
    pstore.delete(F.col("userid") == 1)
    after = _files_under(pstore.path)
    untouched_after = {p: t for p, t in after.items() if "part=1" not in p}
    assert untouched_before == untouched_after
    rows = {(r.userid, r.itemid) for r in pstore.read().collect()}
    assert rows == {(2, 10), (3, 30)}


def test_partitioned_partial_delete_rewrites_one_partition(spark, pstore):
    pstore.delete((F.col("userid") == 1) & (F.col("itemid") == 20))
    rows = {(r.userid, r.itemid) for r in pstore.read().collect()}
    assert rows == {(1, 10), (2, 10), (3, 30)}


def test_partitioned_update_and_partition_col_guard(spark, pstore):
    before = _files_under(pstore.path)
    untouched_before = {p: t for p, t in before.items() if "part=2" not in p}
    pstore.update({"ratingval": F.lit(9.0)}, F.col("userid") == 2)
    untouched_after = {p: t for p, t in _files_under(pstore.path).items()
                       if "part=2" not in p}
    assert untouched_before == untouched_after
    vals = {(r.userid, r.itemid): r.ratingval for r in pstore.read().collect()}
    assert vals[(2, 10)] == 9.0 and vals[(1, 10)] == 4.0
    with pytest.raises(ValueError, match="partition column"):
        pstore.update({"userid": F.lit(7)}, F.col("itemid") == 10)


def test_partitioned_snapshot_isolation(spark, pstore):
    before = pstore.read()
    pstore.delete(F.col("userid") == 1)
    assert before.count() == 4
    assert pstore.read().count() == 2


def test_partitioned_noop_predicates(spark, pstore):
    v = pstore.version
    pstore.delete(F.col("userid") == 99)     # matches nothing
    pstore.update({"ratingval": F.lit(0.0)}, F.col("userid") == 99)
    assert pstore.version == v               # no rewrite, no new version
    assert pstore.read().count() == 4


def test_time_travel_reads_old_versions(spark, store):
    v1 = store.version
    store.append(spark.createDataFrame([(9, 90, 3.0)], SCHEMA))
    store.delete(F.col("userid") == 1)
    assert store.read().count() == 2
    assert store.read(version=v1).count() == 3       # pre-append snapshot
    assert store.read(version=v1 + 1).count() == 4   # pre-delete snapshot
    with pytest.raises(ValueError, match="no version"):
        store.read(version=99)


def test_compact_merges_deltas_without_changing_rows(spark, store):
    for i in range(4, 8):
        store.append(spark.createDataFrame([(i, i * 10, 1.0)], SCHEMA))
    before = {tuple(r) for r in store.read().collect()}
    store.compact()
    assert {tuple(r) for r in store.read().collect()} == before
    # one live dir now; a second compact is a no-op (no version bump)
    v = store.version
    store.compact()
    assert store.version == v


def test_partitioned_compact_skips_single_dir_partitions(spark, pstore):
    pstore.append(spark.createDataFrame([(1, 99, 1.0)], SCHEMA))  # frag part=1
    before = {tuple(r) for r in pstore.read().collect()}
    mt_before = {p: t for p, t in _files_under(pstore.path).items()
                 if "part=1" not in p}
    pstore.compact()
    assert {tuple(r) for r in pstore.read().collect()} == before
    mt_after = {p: t for p, t in _files_under(pstore.path).items()
                if "part=1" not in p}
    assert mt_before == mt_after      # only the fragmented partition moved


def test_vacuum_reclaims_and_ends_time_travel(spark, store):
    import os
    v1 = store.version
    store.append(spark.createDataFrame([(5, 50, 2.0)], SCHEMA))
    store.delete(F.col("userid") == 1)
    removed = store.vacuum()
    assert removed                                     # something reclaimed
    assert store.read().count() == 2                   # current intact
    with pytest.raises(ValueError, match="no version"):
        store.read(version=v1)
    # retained-window variant keeps the last version readable
    s2 = EventStore(spark, store.path)
    s2.append(spark.createDataFrame([(6, 60, 2.0)], SCHEMA))
    prev = s2.version - 1
    s2.vacuum(retain_versions=1)
    assert s2.read(version=prev).count() == 2


def test_vacuum_without_history_never_sweeps_current_data(spark, store):
    """A store predating the _versions history (or with its history
    deleted) must treat the CURRENT manifest as live — vacuum may
    reclaim nothing it references."""
    import os
    import shutil

    store.append(spark.createDataFrame([(7, 70, 1.0)], SCHEMA))
    shutil.rmtree(os.path.join(store.path, "_versions"))
    store.vacuum()
    assert store.read().count() == 4      # current snapshot intact


def test_concurrent_writer_conflict_detected(spark, tmp_path):
    """Two writer handles on the same store: the one whose mutation
    derived from a stale version must get ConcurrentWriteError, never
    silently drop the other's commit."""
    from recdb_postgresql_spark.sources.event_store import (
        ConcurrentWriteError)

    a = EventStore(spark, str(tmp_path / "occ"))
    a.append(spark.createDataFrame([(1, 10, 4.0)], SCHEMA))
    b = EventStore(spark, str(tmp_path / "occ"))

    # interleave: a captures its base, b commits first
    a._begin_mutation()
    b.append(spark.createDataFrame([(2, 20, 2.0)], SCHEMA))
    with pytest.raises(ConcurrentWriteError, match="conflict"):
        a._commit(a._manifest()["dirs"] + ["ghost_dir"])
    # the losing writer retried from fresh state -> both rows live
    a.delete(F.col("userid") == 99)  # no-op mutation, fresh base: OK
    assert {r.userid for r in a.read().collect()} == {1, 2}


def test_commit_lock_timeout_surfaces_stale_lock(spark, tmp_path):
    import os

    from recdb_postgresql_spark.sources.event_store import (
        ConcurrentWriteError)

    s = EventStore(spark, str(tmp_path / "locked"))
    s.append(spark.createDataFrame([(1, 10, 4.0)], SCHEMA))
    lock = os.path.join(str(tmp_path / "locked"), "_commit.lock")
    open(lock, "w").close()  # a crashed writer's leftover
    with pytest.raises(ConcurrentWriteError, match="lock"):
        with s._commit_lock(timeout=0.3):
            pass
    os.unlink(lock)
    s.append(spark.createDataFrame([(2, 20, 2.0)], SCHEMA))  # recovered
    assert s.read().count() == 2


def test_compact_zorder_and_history(spark, tmp_path):
    s = EventStore(spark, str(tmp_path / "zs"))
    s.append(spark.createDataFrame(
        [(u, i, float(u + i)) for u in range(40) for i in range(10, 14)],
        SCHEMA))
    s.append(spark.createDataFrame([(99, 99, 1.0)], SCHEMA))
    s.delete(F.col("userid") == 99)
    before = {(r.userid, r.itemid, r.ratingval) for r in s.read().collect()}
    s.compact(zorder_by=["userid", "itemid"], zorder_files=4)
    after = {(r.userid, r.itemid, r.ratingval) for r in s.read().collect()}
    assert after == before                      # clustering changes no row
    hist = s.history()
    assert [h["op"] for h in hist] == ["append", "append", "delete",
                                       "compact"]
    assert all(h["n_refs"] >= 1 for h in hist)
    # vacuumed versions are reported, not silently skipped
    s.vacuum(retain_versions=0)
    ops = [h["op"] for h in s.history()]
    assert ops[-1] == "compact" and "vacuumed" in ops[:-1]


def test_compact_zorder_rejected_on_partitioned(spark, tmp_path):
    s = EventStore(spark, str(tmp_path / "zp"), partition_col="userid")
    s.append(spark.createDataFrame([(1, 10, 4.0)], SCHEMA))
    with pytest.raises(ValueError, match="unpartitioned"):
        s.compact(zorder_by=["itemid"])
