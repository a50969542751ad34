"""Shared-frame materialization with a storage policy knob.

Catalyst inlines a reused DataFrame subtree once per consuming leg and
ReusedExchange does not fire across separate shuffles in this
codebase's shapes, so a frame consumed by N legs is computed N times
unless it is explicitly materialized first. ``materialize()`` is the
one place that decides HOW such a frame is stored:

- ``local`` (default): ``localCheckpoint`` — executor-local,
  non-replicated blocks with truncated lineage. Cheapest on a single
  machine (the test harness), but on a real cluster a lost executor
  makes the frame unrecoverable and MEMORY_AND_DISK block pressure
  competes with shuffle memory.
- ``disk``: ``persist(DISK_ONLY)`` forced by a ``count()``. Lineage is
  kept (a lost block recomputes), blocks spill to local disk instead
  of squeezing the unified memory region, and the form is the right
  default for CORPUS-SCALE shared frames (one row per rating /
  (doc,term) / (doc,shingle)) on a cluster. Measured (stress.py
  matpolicy, x64 decade, 320k docs): disk already wins 1.39x over
  localCheckpoint on the shingle-heavy dedup shape ON ONE BOX
  (198 -> 142 s — block pinning vs shuffle memory), while costing
  ~11% on the light tfidf shape (2.95 -> 3.28 s).
- ``none``: return the frame unchanged (turn sharing off; measurement
  escape hatch).

The knob is ``RECDB_MAT_STORAGE`` (env) so the driver's bench, which
controls only env, can flip it without code edits; per-call sites may
pin a policy with the ``storage=`` argument when one form is provably
right for their frame's scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

VALID = ("local", "disk", "none")


def materialize(df: DataFrame, storage: str | None = None) -> DataFrame:
    """Materialize ``df`` so downstream consumers share one computation.

    ``storage``: override the ``RECDB_MAT_STORAGE`` policy for this
    call site (``local`` | ``disk`` | ``none``)."""
    mode = storage or os.environ.get("RECDB_MAT_STORAGE", "local")
    if mode not in VALID:
        raise ValueError(f"RECDB_MAT_STORAGE must be one of {VALID}, "
                         f"got {mode!r}")
    if mode == "none":
        return df
    if mode == "disk":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()
        return out
    return df.localCheckpoint(eager=True)
