"""Copy-on-write event store: the ModifyTable (INSERT/UPDATE/DELETE)
surface (PG ``nodeModifyTable.c:717``) without a table-format
dependency.

Parquet is immutable, so mutations write a NEW versioned snapshot
directory and atomically advance a manifest pointer — the same
copy-on-write discipline Delta/Iceberg use, reduced to one pointer
file. Readers pin the version current at read time; concurrent readers
of older versions keep working because old snapshot dirs are retained.

- ``append(df)``   -> INSERT: writes only the new rows as a delta file
  set inside the current version's dir list (no rewrite).
- ``delete(pred)`` -> DELETE ... WHERE: rewrites the surviving rows to
  a new snapshot (copy-on-write).
- ``update(set_map, pred)`` -> UPDATE ... SET ... WHERE: same rewrite
  with column expressions applied to matching rows.

Two layouts:

- ``partition_col=None``: whole-table copy-on-write — every
  DELETE/UPDATE rewrites all live rows. Correct, simple, and the
  wrong shape past ~GB scale.
- ``partition_col='k'``: PARTITION-SCOPED copy-on-write, the 100 TB
  shape. The manifest maps partition value -> live snapshot dirs;
  DELETE/UPDATE first computes the distinct partition values the
  predicate touches, rewrites ONLY those partitions' rows (one
  ``partitionBy`` job into a staging dir, then one metadata move per
  partition — never a per-partition Spark job), and leaves every
  other partition's files untouched on disk. A predicate that
  constrains the partition column prunes the discovery scan through
  ordinary parquet min/max stats. The partition column stays a
  PHYSICAL column in the data files (the directory layout only keys
  the manifest), so reads never depend on path-based partition
  inference. Updating the partition column itself (row migration) is
  rejected — split it into DELETE + INSERT, the same discipline
  early Delta/Hive enforced.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from contextlib import contextmanager
from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """A competing writer committed between this mutation's base read
    and its commit (or holds the commit lock) — re-read and re-apply;
    a blind retry of the stale state would drop the other writer's
    rows."""


class EventStore:
    def __init__(self, spark: SparkSession, path: str,
                 partition_col: Optional[str] = None):
        self.spark = spark
        self.path = path
        self.partition_col = partition_col
        # recommenders whose event table this store backs: every
        # INSERT notifies them (PG hooks ExecInsert itself,
        # ``nodeModifyTable.c:271`` -> updateCellCounter)
        self._maintained: list[tuple] = []
        os.makedirs(path, exist_ok=True)

    def bind_recommender(self, engine, name: str) -> None:
        """Register recommender ``name`` for INSERT-driven maintenance:
        appends through this store bump its update counter and trigger
        the threshold retrain, with no manual ``append_events`` call —
        the ``nodeModifyTable.c:271`` hook surface."""
        if engine.catalog.get(name) is None:
            raise ValueError(f"no recommender {name!r}")
        self._maintained.append((engine, name))

    # -- manifest ------------------------------------------------------
    def _manifest(self) -> dict:
        p = os.path.join(self.path, "manifest.json")
        if not os.path.exists(p):
            if self.partition_col:
                return {"version": 0, "partition_col": self.partition_col,
                        "parts": {}}
            return {"version": 0, "dirs": []}
        with open(p) as f:
            m = json.load(f)
        if self.partition_col and m.get("partition_col") != self.partition_col:
            raise ValueError(
                f"store at {self.path} is partitioned by "
                f"{m.get('partition_col')!r}, not {self.partition_col!r}")
        return m

    @contextmanager
    def _commit_lock(self, timeout: float = 10.0):
        """O_CREAT|O_EXCL lock file serializing commits on any POSIX
        filesystem — the atomic primitive under the optimistic check.
        A crashed writer leaves a stale lock; the timeout surfaces it
        as an error instead of hanging (delete `_commit.lock` after
        confirming no writer is live — the Delta-stale-txn analog)."""
        lock = os.path.join(self.path, "_commit.lock")
        deadline = time.monotonic() + timeout
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise ConcurrentWriteError(
                        f"commit lock at {lock} held past {timeout}s — "
                        "another writer is committing, or a crashed "
                        "one left a stale lock")
                time.sleep(0.05)
        try:
            yield
        finally:
            os.close(fd)
            os.unlink(lock)

    def _begin_mutation(self) -> None:
        """Capture the version this mutation's DATA derives from —
        the optimistic-concurrency base. Called first thing by every
        mutating method; the commit CAS-checks against it."""
        self._base_version = self._manifest()["version"]

    def _write_manifest(self, m: dict) -> None:
        """Optimistic-concurrency commit (the Delta protocol shape):
        every mutation captured its base version at entry
        (``_begin_mutation``), derived new state from that snapshot,
        and commits here — under the lock, the on-disk version must
        still BE the base or a concurrent writer won the race and this
        commit raises ``ConcurrentWriteError`` (retry = re-read and
        re-apply; a blind retry of the stale derivation would silently
        drop the other writer's rows). Snapshot isolation for readers
        is untouched — they never take the lock."""
        expect = getattr(self, "_base_version", None)
        if expect is None:
            expect = m["version"]
        try:
            with self._commit_lock():
                p = os.path.join(self.path, "manifest.json")
                if os.path.exists(p):
                    with open(p) as f:
                        on_disk = json.load(f)["version"]
                else:
                    on_disk = 0
                if on_disk != expect:
                    raise ConcurrentWriteError(
                        f"write-write conflict at {self.path}: this "
                        f"mutation derived from version {expect} but "
                        f"version {on_disk} is now committed — re-read "
                        "and re-apply")
                self._write_manifest_locked(m)
        finally:
            self._base_version = None

    def _write_manifest_locked(self, m: dict) -> None:
        m["version"] += 1
        tmp = os.path.join(self.path, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, os.path.join(self.path, "manifest.json"))  # atomic
        # retained manifest history = time travel: every version's
        # snapshot stays readable until vacuum() reclaims it. Same
        # tmp+replace discipline as manifest.json: a crash mid-write
        # must never leave a truncated history file (vacuum json.loads
        # every retained version).
        hist = os.path.join(self.path, "_versions")
        os.makedirs(hist, exist_ok=True)
        htmp = os.path.join(hist, f"v{m['version']}.json.tmp")
        with open(htmp, "w") as f:
            json.dump(m, f)
        os.replace(htmp, os.path.join(hist, f"v{m['version']}.json"))

    def _commit(self, dirs: list[str]) -> None:
        m = self._manifest()
        m["dirs"] = dirs
        self._write_manifest(m)

    def _new_dir(self, tag: str) -> str:
        m = self._manifest()
        d = f"v{m['version'] + 1}_{tag}"
        return d

    # -- partition-scoped write path -----------------------------------
    def _write_parts(self, df: DataFrame, tag: str) -> dict[str, str]:
        """ONE ``partitionBy`` job into a staging dir, then a metadata
        move per partition into ``<path>/part=<val>/v<N>_<tag>`` —
        the rewrite cost is one Spark job over the affected rows plus
        O(affected partitions) renames, never a job per partition.
        The real column rides inside the files (``_p`` is a throwaway
        routing copy), so readers never parse paths."""
        ver = self._manifest()["version"] + 1
        staging = os.path.join(self.path, f"_staging_v{ver}_{tag}")
        (df.withColumn("_p", F.col(self.partition_col).cast("string"))
           .write.mode("overwrite").partitionBy("_p").parquet(staging))
        moved: dict[str, str] = {}
        for entry in os.listdir(staging):
            if not entry.startswith("_p="):
                continue
            val = entry[len("_p="):]
            pdir = os.path.join(self.path, f"part={val}")
            os.makedirs(pdir, exist_ok=True)
            rel = os.path.join(f"part={val}", f"v{ver}_{tag}")
            os.rename(os.path.join(staging, entry),
                      os.path.join(self.path, rel))
            moved[val] = rel
        shutil.rmtree(staging, ignore_errors=True)
        return moved

    def _affected_parts(self, predicate: Column) -> list[str]:
        """Distinct partition values holding at least one row the
        predicate matches (TRUE under three-valued logic). A predicate
        constraining the partition column prunes this scan via parquet
        stats; the result list is small by the same contract as any
        partition-pruning predicate."""
        rows = (self.read()
                .where(F.coalesce(predicate, F.lit(False)))
                .select(F.col(self.partition_col).cast("string").alias("_p"))
                .distinct().collect())
        # NULL partition values land in the Hive default-partition dir,
        # so key the manifest the same way
        return ["__HIVE_DEFAULT_PARTITION__" if r["_p"] is None else r["_p"]
                for r in rows]

    def _read_parts(self, vals: list[str]) -> DataFrame:
        m = self._manifest()
        paths = [os.path.join(self.path, rel)
                 for v in vals for rel in m["parts"].get(v, [])]
        return self.spark.read.parquet(*paths)

    # -- DML surface ---------------------------------------------------
    def read(self, version: Optional[int] = None) -> DataFrame:
        """Current snapshot, or — with ``version`` — TIME TRAVEL to any
        earlier committed version: copy-on-write never mutates old
        snapshot dirs and every commit's manifest is retained, so
        ``read(version=3)`` is exactly the table as of commit 3 until
        ``vacuum()`` reclaims unreferenced files."""
        if version is None:
            m = self._manifest()
        else:
            p = os.path.join(self.path, "_versions", f"v{version}.json")
            if not os.path.exists(p):
                raise ValueError(
                    f"no version {version} at {self.path} "
                    "(never committed, or vacuumed)")
            with open(p) as f:
                m = json.load(f)
        if self.partition_col:
            paths = [os.path.join(self.path, rel)
                     for rels in m["parts"].values() for rel in rels]
        else:
            paths = [os.path.join(self.path, d) for d in m["dirs"]]
        if not paths:
            raise ValueError(f"empty event store at {self.path}")
        return self.spark.read.parquet(*paths)

    def append(self, df: DataFrame) -> None:
        self._begin_mutation()
        if self.partition_col:
            moved = self._write_parts(df, "append")
            m = self._manifest()
            for val, rel in moved.items():
                m["parts"].setdefault(val, []).append(rel)
            self._write_manifest(m)
        else:
            d = self._new_dir("append")
            df.write.mode("overwrite").parquet(os.path.join(self.path, d))
            self._commit(self._manifest()["dirs"] + [d])
        for engine, name in self._maintained:
            engine.record_insert(name, df, self.read())

    def delete(self, predicate: Column) -> None:
        self._begin_mutation()
        # survivors are rows where the predicate is NOT TRUE: a NULL
        # predicate (NULL in a predicate column) must KEEP the row,
        # matching SQL DELETE ... WHERE three-valued logic
        if self.partition_col:
            affected = self._affected_parts(predicate)
            if not affected:
                return
            survivors = (self._read_parts(affected)
                         .where(~F.coalesce(predicate, F.lit(False))))
            moved = self._write_parts(survivors, "delete")
            m = self._manifest()
            for val in affected:
                if val in moved:
                    m["parts"][val] = [moved[val]]
                else:
                    m["parts"].pop(val, None)  # partition fully deleted
            self._write_manifest(m)
            return
        survivors = self.read().where(~F.coalesce(predicate, F.lit(False)))
        d = self._new_dir("delete")
        survivors.write.mode("overwrite").parquet(os.path.join(self.path, d))
        self._commit([d])

    def update(self, set_map: Mapping[str, Column], predicate: Column) -> None:
        self._begin_mutation()
        if self.partition_col and self.partition_col in set_map:
            raise ValueError(
                f"updating the partition column {self.partition_col!r} "
                "moves rows across partitions — use delete + append")
        if self.partition_col:
            affected = self._affected_parts(predicate)
            if not affected:
                return
            df = self._read_parts(affected)
            cols = [
                F.when(F.coalesce(predicate, F.lit(False)),
                       set_map[c]).otherwise(F.col(c)).alias(c)
                if c in set_map else F.col(c)
                for c in df.columns
            ]
            moved = self._write_parts(df.select(*cols), "update")
            m = self._manifest()
            for val in affected:
                m["parts"][val] = [moved[val]]
            self._write_manifest(m)
            return
        df = self.read()
        cols = [
            F.when(predicate, set_map[c]).otherwise(F.col(c)).alias(c)
            if c in set_map else F.col(c)
            for c in df.columns
        ]
        d = self._new_dir("update")
        df.select(*cols).write.mode("overwrite").parquet(os.path.join(self.path, d))
        self._commit([d])

    def merge(self, source: DataFrame, keys: Sequence[str],
              update_cols: Optional[Sequence[str]] = None,
              insert: bool = True,
              delete_col: Optional[str] = None,
              update_exprs: Optional[Mapping] = None) -> None:
        """MERGE INTO (upsert) — the canonical CDC-ingest statement:
        matched keys update, unmatched source rows insert, source
        tombstones (``delete_col`` true) delete. Semantics are
        ``operators.dml.merge_into``'s (including the unique-source-key
        precondition); this method applies them transactionally via
        the same copy-on-write commit as update/delete.

        Partitioned stores rewrite ONLY affected partitions: the ones
        holding a matched key (one semi-join to discover) plus the
        ones the source itself lands rows in — untouched partitions'
        files stay byte-identical. The partition column cannot be an
        update target (rows would change partition) — delete + insert
        instead, same rule as ``update``."""
        from recdb_postgresql_spark.operators.dml import merge_into

        self._begin_mutation()
        keys = list(keys)
        if not self.partition_col:
            merged = merge_into(self.read(), source, keys, update_cols,
                                insert, delete_col, update_exprs)
            d = self._new_dir("merge")
            merged.write.mode("overwrite").parquet(
                os.path.join(self.path, d))
            self._commit([d])
            return
        if ((update_cols is not None and self.partition_col in update_cols)
                or (update_exprs and self.partition_col in update_exprs)):
            raise ValueError(
                f"updating the partition column {self.partition_col!r} "
                "moves rows across partitions — use delete + append")
        if update_cols is None:
            update_cols = [c for c in source.columns
                           if c in self.read().columns
                           and c not in keys and c != delete_col
                           and c != self.partition_col
                           and c not in (update_exprs or {})]
        tgt = self.read()
        pcol = F.col(self.partition_col).cast("string").alias("_p")
        matched_vals = (tgt.join(source.select(*keys).distinct(),
                                 keys, "left_semi")
                        .select(pcol).distinct().collect())
        source_vals = source.select(pcol).distinct().collect()
        vals = sorted({"__HIVE_DEFAULT_PARTITION__" if r["_p"] is None
                       else r["_p"] for r in matched_vals + source_vals})
        m = self._manifest()
        existing = [v for v in vals if v in m["parts"]]
        sub = self._read_parts(existing) if existing else tgt.limit(0)
        merged = merge_into(sub, source, keys, update_cols,
                            insert, delete_col, update_exprs)
        moved = self._write_parts(merged, "merge")
        m = self._manifest()
        for val in vals:
            if val in moved:
                m["parts"][val] = [moved[val]]
            else:
                m["parts"].pop(val, None)  # partition emptied by merge
        self._write_manifest(m)

    # -- maintenance ---------------------------------------------------
    def compact(self, zorder_by: Optional[Sequence[str]] = None,
                zorder_bits: int = 16, zorder_files: int = 32) -> None:
        """Merge accumulated append deltas into one snapshot per
        table (unpartitioned) or per multi-dir partition (partitioned
        — single-dir partitions are already compact and are NOT
        rewritten). Appends-heavy stores accrete many small file sets;
        compaction restores scan efficiency without changing a row.

        ``zorder_by`` (unpartitioned stores) makes the rewritten
        snapshot Z-ORDER CLUSTERED on the given columns — the Delta
        OPTIMIZE ZORDER analog via ``sinks.write_zordered``: every
        output file covers a compact range in ALL the interleaved
        dimensions, so parquet footer stats skip files for predicates
        on any of them. Clustering changes bytes, so it rewrites even
        an already-single-dir snapshot. Partitioned stores reject it:
        the partition layout IS their coarse index, and re-clustering
        inside partitions is a different (finer) maintenance knob."""
        self._begin_mutation()
        if self.partition_col:
            if zorder_by:
                raise ValueError(
                    "zorder_by applies to unpartitioned stores — the "
                    "partition layout is already the coarse index")
            m = self._manifest()
            frag = [v for v, rels in m["parts"].items() if len(rels) > 1]
            if not frag:
                return
            moved = self._write_parts(self._read_parts(frag), "compact")
            m = self._manifest()
            for val in frag:
                m["parts"][val] = [moved[val]]
            self._write_manifest(m)
            return
        m = self._manifest()
        if len(m["dirs"]) <= 1 and not zorder_by:
            return
        d = self._new_dir("compact")
        if zorder_by:
            from recdb_postgresql_spark.sources.sinks import write_zordered

            write_zordered(self.read(), os.path.join(self.path, d),
                           list(zorder_by), bits=zorder_bits,
                           num_files=zorder_files)
        else:
            self.read().write.mode("overwrite").parquet(
                os.path.join(self.path, d))
        self._commit([d])

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY analog: one record per committed version,
        oldest first — (version, op, n_refs), with op recovered from
        the snapshot-dir naming convention (``v<N>_<tag>``) and n_refs
        the number of live dirs that version references. Versions
        vacuumed away report op='vacuumed' (their manifest is gone but
        their number is implied by the sequence)."""
        hist_dir = os.path.join(self.path, "_versions")
        cur = self._manifest()["version"]
        out = []
        for v in range(1, cur + 1):
            p = os.path.join(hist_dir, f"v{v}.json")
            if not os.path.exists(p):
                out.append({"version": v, "op": "vacuumed", "n_refs": 0})
                continue
            with open(p) as f:
                m = json.load(f)
            rels = ([r for rs in m["parts"].values() for r in rs]
                    if self.partition_col else m["dirs"])
            tag = "unknown"
            for rel in rels:
                base = os.path.basename(rel)
                if base.startswith(f"v{v}_"):
                    tag = base[len(f"v{v}_"):]
                    break
            out.append({"version": v, "op": tag, "n_refs": len(rels)})
        return out

    def vacuum(self, retain_versions: int = 0) -> list[str]:
        """Reclaim snapshot dirs no version within the last
        ``retain_versions`` commits references. Ends time travel (and
        breaks readers still pinned) beyond the retained window —
        the Delta VACUUM trade, stated plainly. Returns removed dirs."""
        cur = self._manifest()
        keep_versions = range(max(1, cur["version"] - retain_versions),
                              cur["version"] + 1)

        def _live_of(m: dict) -> set[str]:
            if self.partition_col:
                return {rel for rels in m["parts"].values()
                        for rel in rels}
            return set(m["dirs"])

        # the CURRENT manifest is authoritative and is ALWAYS live —
        # a store predating the _versions history (or with a missing
        # history file) must never have its referenced snapshots swept
        live: set[str] = _live_of(cur)
        for v in keep_versions:
            p = os.path.join(self.path, "_versions", f"v{v}.json")
            if not os.path.exists(p):
                continue
            with open(p) as f:
                live |= _live_of(json.load(f))
        removed = []
        roots = ([e for e in os.listdir(self.path)
                  if e.startswith("part=")] if self.partition_col
                 else [""])
        for root in roots:
            base = os.path.join(self.path, root) if root else self.path
            for entry in os.listdir(base):
                rel = os.path.join(root, entry) if root else entry
                full = os.path.join(base, entry)
                if (os.path.isdir(full) and entry.startswith("v")
                        and rel not in live):
                    shutil.rmtree(full)
                    removed.append(rel)
        # drop manifests outside the retained window
        import re as _re
        hist = os.path.join(self.path, "_versions")
        if os.path.isdir(hist):
            for entry in os.listdir(hist):
                m = _re.fullmatch(r"v(\d+)\.json", entry)
                if m and int(m.group(1)) not in keep_versions:
                    os.remove(os.path.join(hist, entry))
        return removed

    @property
    def version(self) -> int:
        return self._manifest()["version"]
