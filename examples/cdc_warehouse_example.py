"""End-to-end example: a CDC-fed warehouse table with history.

The seventh walkthrough — the WAREHOUSE surface: how a change-data
feed (Debezium-style upserts + tombstones) becomes a queryable,
versioned, partition-pruned table with full dimensional history:

  1. seed        EventStore (partitioned by userid) from the initial
                 load
  2. CDC apply   StreamingMerger: each micro-batch collapses to its
                 last change per key (by CDC sequence) and MERGEs as
                 ONE transactional commit — updates in place,
                 tombstones delete, new keys insert; only affected
                 partitions rewrite
  3. audit       EventStore time travel + profile_drift: what did the
                 day's batches do to the value distribution?
  4. history     scd2_build over the raw change log: every key's
                 validity intervals (the Type-2 dimension a
                 point-in-time join consumes)
  5. maintenance compact() then vacuum() — bounded file count, old
                 versions reclaimed, the stated time-travel trade

Run:  python examples/cdc_warehouse_example.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from recdb_postgresql_spark.operators.profile import profile_drift  # noqa: E402
from recdb_postgresql_spark.operators.temporal import scd2_build  # noqa: E402
from recdb_postgresql_spark.sources.event_store import EventStore  # noqa: E402
from recdb_postgresql_spark.streaming import StreamingMerger  # noqa: E402

SCHEMA = "userid long, itemid long, ratingval double"
CDC = SCHEMA + ", seq long, is_del boolean"


def run(spark, work_dir: str | None = None, verbose: bool = True):
    work_dir = work_dir or tempfile.mkdtemp(prefix="cdc_wh_")
    say = print if verbose else (lambda *a, **k: None)

    # 1. seed ---------------------------------------------------------
    store = EventStore(spark, os.path.join(work_dir, "ratings"),
                       partition_col="userid")
    store.append(spark.createDataFrame(
        [(u, i, float(2 + (u + i) % 4))
         for u in range(4) for i in (10, 20, 30)], SCHEMA))
    v_seed = store.version
    say(f"seeded {store.read().count()} rows at version {v_seed}")

    # 2. CDC apply ----------------------------------------------------
    merger = StreamingMerger(store, ["userid", "itemid"], seq_col="seq",
                             delete_col="is_del")
    # seq is the GLOBAL CDC log position (seed rows are seq 0), so the
    # same column orders both the per-batch collapse and the SCD2 log
    day1 = spark.createDataFrame(
        [(0, 10, 5.0, 2, False),   # update
         (0, 10, 1.0, 1, False),   # older change, loses to seq=2
         (1, 20, 0.0, 2, True),    # tombstone
         (9, 10, 4.0, 1, False)],  # brand-new user -> new partition
        CDC)
    day2 = spark.createDataFrame(
        [(9, 10, 0.0, 3, True),    # yesterday's insert deleted
         (2, 30, 2.5, 3, False)], CDC)
    merger.on_batch(day1)
    merger.on_batch(day2)
    cur = store.read()
    say(f"after {merger.batches} CDC batches: {cur.count()} rows "
        f"(version {store.version})")

    # 3. audit: time travel + drift report ----------------------------
    drift = profile_drift(store.read(version=v_seed), cur,
                          ["ratingval"], quantiles=(0.5,))
    say("drift seed -> current:")
    for r in drift.collect():
        say(f"  {r.stat:>10}: {r.old_value} -> {r.new_value} "
            f"(rel {r.rel_change})")

    # 4. Type-2 history from the raw change log -----------------------
    log = (store.read(version=v_seed)
           .select("userid", "itemid", "ratingval",
                   F.lit(0).alias("seq"))
           .unionByName(day1.where(~F.col("is_del"))
                        .select("userid", "itemid", "ratingval", "seq"))
           .unionByName(day2.where(~F.col("is_del"))
                        .select("userid", "itemid", "ratingval", "seq")))
    # materialize BEFORE maintenance: the lazy plan reads snapshot
    # files vacuum() is about to reclaim — pin outputs, then vacuum
    dim = scd2_build(log, ["userid", "itemid"], "seq",
                     ["ratingval"]).localCheckpoint(eager=True)
    n_current = dim.where("is_current").count()
    say(f"SCD2 dimension: {dim.count()} intervals, "
        f"{n_current} current states")

    # 5. maintenance --------------------------------------------------
    store.compact()
    removed = store.vacuum(retain_versions=1)
    say(f"compacted; vacuum reclaimed {len(removed)} snapshot dirs")
    return store, dim


if __name__ == "__main__":
    from recdb_postgresql_spark.engine import get_spark

    s = get_spark("cdc_warehouse_example")
    s.sparkContext.setLogLevel("ERROR")
    run(s)
