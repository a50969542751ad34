"""Partition-layout helpers shared by the compute-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small(df: DataFrame) -> DataFrame:
    """Repartition up to cluster parallelism when the source has fewer
    partitions — a small parquet file arrives as 1 partition and would
    pin a whole expression-heavy stage (shingling, pairwise cosine) to
    one core (measured 4.5s -> 0.3s on sf0.1 shingling). At real scale
    input partitions >> cores, so this is a no-op there; the check
    costs one plan conversion."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
