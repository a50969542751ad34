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
  a new snapshot (copy-on-write; at scale you'd partition first and
  rewrite only affected partitions — partition pruning applies to the
  predicate the same way).
- ``update(set_map, pred)`` -> UPDATE ... SET ... WHERE: same rewrite
  with column expressions applied to matching rows.

At 100 TB: snapshots are per-partition, the rewrite set is pruned by
the predicate, and the manifest lists partition->files; this class
keeps the manifest a single JSON for clarity, the operator surface is
identical.
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class EventStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
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
            return {"version": 0, "dirs": []}
        with open(p) as f:
            return json.load(f)

    def _commit(self, dirs: list[str]) -> None:
        m = self._manifest()
        m["version"] += 1
        m["dirs"] = dirs
        tmp = os.path.join(self.path, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, os.path.join(self.path, "manifest.json"))  # atomic swap

    def _new_dir(self, tag: str) -> str:
        m = self._manifest()
        d = f"v{m['version'] + 1}_{tag}"
        return d

    # -- DML surface ---------------------------------------------------
    def read(self) -> DataFrame:
        m = self._manifest()
        if not m["dirs"]:
            raise ValueError(f"empty event store at {self.path}")
        paths = [os.path.join(self.path, d) for d in m["dirs"]]
        return self.spark.read.parquet(*paths)

    def append(self, df: DataFrame) -> None:
        d = self._new_dir("append")
        df.write.mode("overwrite").parquet(os.path.join(self.path, d))
        self._commit(self._manifest()["dirs"] + [d])
        for engine, name in self._maintained:
            engine.record_insert(name, df, self.read())

    def delete(self, predicate: Column) -> None:
        # survivors are rows where the predicate is NOT TRUE: a NULL
        # predicate (NULL in a predicate column) must KEEP the row,
        # matching SQL DELETE ... WHERE three-valued logic
        survivors = self.read().where(~F.coalesce(predicate, F.lit(False)))
        d = self._new_dir("delete")
        survivors.write.mode("overwrite").parquet(os.path.join(self.path, d))
        self._commit([d])

    def update(self, set_map: Mapping[str, Column], predicate: Column) -> None:
        df = self.read()
        cols = [
            F.when(predicate, set_map[c]).otherwise(F.col(c)).alias(c)
            if c in set_map else F.col(c)
            for c in df.columns
        ]
        d = self._new_dir("update")
        df.select(*cols).write.mode("overwrite").parquet(os.path.join(self.path, d))
        self._commit([d])

    @property
    def version(self) -> int:
        return self._manifest()["version"]
