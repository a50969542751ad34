"""Deterministic, engine-portable hashing.

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are different
algorithms, so sketch operators (MinHash, SimHash, fingerprints) built
on them could never be validated against a SQL oracle. Instead every
sketch in this engine hashes through md5 — identical bytes in every
engine — truncated to 60 bits (15 hex chars), which always fits a
signed int64.

Spark:  conv(substring(md5(x), 1, 15), 16, 10) :: long
DuckDB: cast('0x' || substring(md5(x), 1, 15) as bigint)

md5 is computed JVM-side (codegen'd); this is not the fast path you
would pick for a pure-Spark deployment (xxhash64 is ~5x faster). The
sketch operators accept a ``hash_fn`` parameter (any Column -> Column
producing a non-negative int64): pass ``md5_long`` (default) for
oracle-verifiable runs, ``xxhash64_long`` for production throughput —
the sketches' semantics only need a deterministic well-mixed hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column) -> Column:
    """60-bit non-negative int64 hash of a string column, portable."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def xxhash64_long(col: Column) -> Column:
    """60-bit non-negative int64 via Spark's native xxhash64 — the
    production hash (~5x faster than md5, one codegen'd intrinsic, no
    hex round-trip). Same range as ``md5_long`` so every downstream
    band/rehash/bit trick behaves identically; NOT reproducible outside
    Spark, so oracle-checked queries keep the md5 default."""
    return F.pmod(F.xxhash64(col), F.lit(1 << 60)).cast("long")


def seeded_hash(col: Column, seed: int) -> Column:
    """Family of independent hash functions h_seed(x) for MinHash rows /
    SimHash bit groups: prefix the seed before hashing."""
    return md5_long(F.concat(F.lit(f"{seed}:"), col))


# The exact SQL equivalents, for building oracle queries:
MD5_LONG_SQL = "CAST(concat('0x', substring(md5({x}), 1, 15)) AS BIGINT)"
SEEDED_SQL = "CAST(concat('0x', substring(md5(concat('{seed}:', {x})), 1, 15)) AS BIGINT)"
