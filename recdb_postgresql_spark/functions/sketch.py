"""Count-min sketch as plain DataFrame state: a depth x width counter
matrix — the mergeable, constant-size frequency summary for streams
and shards whose exact per-key counts would be another corpus-sized
shuffle. Complements the built-in sketches already used elsewhere
(HLL++ distinct, KLL quantiles) with the point-frequency one Spark
lacks.

Properties (classic CMS): estimate(k) >= true(k) always; with width w
and depth d, P[estimate - true > 2N/w] < (1/2)^d. Two sketches over
disjoint data UNION + re-sum into the sketch of the union (tested) —
which is what makes this the 100 TB shape: shards sketch locally,
the d x w matrices merge as rows.

Hashing is the portable md5 family, so a SQL oracle reproduces the
sketch bit-for-bit (no RNG, no seeds to ship)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recdb_postgresql_spark.functions.hashing import md5_long


def cms_build(df: DataFrame, col: str, depth: int = 4, width: int = 64,
              hash_fn=md5_long) -> DataFrame:
    """(j, bucket, cnt): the depth x width counter matrix for the
    values of ``col`` (nulls excluded — a null key has no identity to
    count). One explode-by-row then ONE map-side-combined aggregate;
    the result is at most depth*width rows regardless of input size."""
    rows = (df.where(F.col(col).isNotNull())
            .select(F.col(col).cast("string").alias("_v"))
            .select("_v", F.explode(F.sequence(
                F.lit(0), F.lit(depth - 1))).alias("j")))
    bucket = hash_fn(F.concat_ws(":", F.col("j").cast("string"),
                                 F.col("_v"))) % width
    return (rows.select("j", bucket.alias("bucket"))
            .groupBy("j", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """The sketch of the union of the sketched inputs: counter
    matrices add cell-wise. Same (depth, width, hash_fn) required —
    they are the sketch's identity."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(cms: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 64,
                 hash_fn=md5_long) -> DataFrame:
    """(key, est): the CMS point estimate min_j counter[j][h_j(key)]
    for each distinct key in ``keys``. The sketch side is tiny
    (broadcast); a bucket no key ever hashed into reads as 0."""
    probes = (keys.select(F.col(key_col))
              .where(F.col(key_col).isNotNull()).distinct()
              .select(key_col, F.col(key_col).cast("string").alias("_v"))
              .select(key_col, "_v", F.explode(F.sequence(
                  F.lit(0), F.lit(depth - 1))).alias("j")))
    bucket = hash_fn(F.concat_ws(":", F.col("j").cast("string"),
                                 F.col("_v"))) % width
    probes = probes.select(key_col, "j", bucket.alias("bucket"))
    joined = probes.join(F.broadcast(cms), ["j", "bucket"], "left")
    return (joined.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")))
