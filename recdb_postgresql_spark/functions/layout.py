"""Partition-layout helpers shared by the compute-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
