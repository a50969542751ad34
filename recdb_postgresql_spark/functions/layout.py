"""Partition-layout helpers shared by the compute-heavy operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_small(df: DataFrame) -> DataFrame:
    """Repartition up to cluster parallelism when the source has fewer
    partitions — a small parquet file arrives as 1 partition and would
    pin a whole expression-heavy stage (shingling, pairwise cosine) to
    one core (measured 4.5s -> 0.3s on sf0.1 shingling). At real scale
    input partitions >> cores, so this is a no-op there; the check
    costs one plan conversion.

    Apply ONLY where per-row expression cost dominates (shingle
    transforms, md5-over-array, pairwise vector folds). For cheap
    map-only projections or stages immediately followed by a shuffle
    (exact dedup, simhash, token stats) the ~0.5 s repartition shuffle
    outweighs the parallelism it buys — measured, round 2."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def zorder_key(df: DataFrame, cols, bits: int = 8,
               clip=(0.01, 0.99), rel_err: float = 0.001):
    """Z-order (Morton) interleave column for multi-dimensional file
    clustering: returns a Column mapping each row to a single long
    such that sorting by it keeps rows close in EVERY listed dimension
    close on disk — so parquet row-group min/max stats prune scans for
    predicates on ANY of the columns, not just the leading sort key
    (the layout move behind Delta/Iceberg OPTIMIZE ZORDER; public
    literature: Morton 1966, the Databricks/Iceberg docs).

    Each column is bucketed into 2**bits equal-width cells between its
    approxQuantile ``clip`` bounds (collected once — 2 scalars per
    column of driver metadata; clipping keeps a single outlier from
    flattening the useful range; values outside clamp to edge cells),
    then the per-dimension cell indices are bit-interleaved JVM-side
    (shiftleft/or expression tree — no UDF, stays in codegen).

    Scale: the quantile pass is one aggregate; the key itself is
    map-side. Heavily SKEWED dimensions want rank (range-partition-id)
    cells rather than equal-width — swap the bucket expression, the
    interleave is unchanged."""
    from pyspark.sql import functions as F

    cols = list(cols)
    if not (1 <= len(cols) <= 8):
        raise ValueError("zorder_key wants 1..8 columns")
    n_cells = (1 << bits) - 1
    buckets = []
    for c in cols:
        lo, hi = df.approxQuantile(c, [clip[0], clip[1]], rel_err)
        if hi <= lo:
            buckets.append(F.lit(0))
            continue
        scaled = ((F.col(c).cast("double") - F.lit(float(lo)))
                  / F.lit(float(hi - lo)) * F.lit(float(n_cells)))
        buckets.append(
            F.least(F.lit(n_cells),
                    F.greatest(F.lit(0),
                               F.floor(scaled).cast("int"))).cast("long"))
    d = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, bk in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(bk, b).bitwiseAND(F.lit(1)),
                            b * d + i))
    return z


def write_zordered(df: DataFrame, path: str, cols, n_files: int,
                   bits: int = 8) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    Z-order key over ``cols``: range-partition on the key (balanced
    files), sort within each file, drop the key before writing so the
    schema is unchanged. Downstream scans with a pushed-down predicate
    on any of ``cols`` skip row groups whose min/max stats exclude it
    — the pruning is free at read time, the cost is this one write."""
    z = zorder_key(df, cols, bits=bits)
    (df.withColumn("__z", z)
       .repartitionByRange(int(n_files), "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def rendezvous_shard(key: Column, n_shards: int) -> Column:
    """Highest-random-weight (rendezvous / HRW) shard id in
    [0, n_shards) for ``key``: argmax over shards of the seeded
    portable hash h(shard, key). The routing primitive behind stable
    sharding: growing n -> n+1 moves EXACTLY the keys whose new-shard
    hash wins — an expected 1/(n+1) of the data — while modulo
    sharding reshuffles (n-1)/n of it. Pure map-side expression (one
    md5 per shard per row, no join, no shuffle): the assignment
    column composes with partitionBy/bucketBy at write time.

    Ties are broken toward the LOWEST shard id (array_position takes
    the first maximum) — with 60-bit hashes a tie is ~2^-60 per
    key-pair, but the rule is pinned so two engines agree."""
    from recdb_postgresql_spark.functions.hashing import seeded_hash

    hs = F.array(*[seeded_hash(key, s) for s in range(n_shards)])
    # 1-based position of the max -> 0-based shard id
    return (F.array_position(hs, F.array_max(hs)) - 1).cast("int")
