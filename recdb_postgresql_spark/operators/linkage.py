"""Blocked fuzzy entity resolution (record linkage).

The classic dedup problem the RELATIONAL side of a pipeline hits:
"are Customer#000000123 and Customer#000000128 the same entity?" —
answered at scale with the blocking pattern: a cheap deterministic
blocking key makes candidate generation an equi-join (never an
all-pairs cross product), and the expensive string distance runs only
inside blocks. The same candidate-first shape as LSH dedup
(`operators/dedup.lsh_verified_pairs`) applied to entity records.

The reference has no ER operator; this is a pipeline extension
(SURVEY.md §2.3). Everything is built-in Catalyst (`levenshtein` is a
JVM expression, identical in DuckDB), so the whole flow is
oracle-checkable and codegen-compiled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_matches(df: DataFrame, block_key: Column,
                    id_col: str = "id", name_col: str = "name",
                    max_dist: int = 2) -> DataFrame:
    """(id1, id2, name1, name2, dist): candidate pairs within a block
    whose names are within ``max_dist`` Levenshtein edits; id1 < id2
    deduplicates the symmetric pair.

    Scale shape: ONE self equi-join on the blocking key — pair cost is
    sum over blocks of n_b², never N². Blocking is the recall knob
    (pairs in different blocks are never compared — the standard,
    documented ER trade); a production run unions several block
    passes (different keys) exactly like multi-band LSH. The distance
    filter runs inside codegen on the joined rows.
    """
    side = df.select(F.col(id_col).alias("_id"),
                     F.col(name_col).alias("_name"),
                     block_key.alias("_blk"))
    a = side.select(F.col("_id").alias("id1"), F.col("_name").alias("name1"),
                    "_blk")
    b = side.select(F.col("_id").alias("id2"), F.col("_name").alias("name2"),
                    "_blk")
    return (a.join(b, "_blk")
            .where(F.col("id1") < F.col("id2"))
            .where(F.levenshtein("name1", "name2") <= max_dist)
            .select("id1", "id2", "name1", "name2",
                    F.levenshtein("name1", "name2").cast("int")
                    .alias("dist")))


def best_match(matches: DataFrame) -> DataFrame:
    """(id1, id2, dist): keep each left id's single best match
    (smallest distance, then smallest id2) — the assignment step after
    candidate scoring. One window over the candidate set."""
    from pyspark.sql import Window

    w = Window.partitionBy("id1").orderBy(F.col("dist"), F.col("id2"))
    return (matches.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("id1", "id2", "dist"))
