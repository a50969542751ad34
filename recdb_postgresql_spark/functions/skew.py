"""Skew-mitigation join: explicit key salting.

AQE's skew-join split (enabled in the engine conf) handles most skew
at runtime by splitting oversized partitions. Salting is the static
alternative for the pathological case AQE cannot fix: one key so hot
that a single join TASK's build side explodes (e.g. a power user with
millions of events joined against their own history).

``salted_join(left, right, key, salt)`` replicates the (small) right
side ``salt`` times and scatters the left side across the replicas, so
the hot key's rows spread over ``salt`` tasks. Exactly equivalent to a
plain inner equi-join (tested) — never changes results, only layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt: int = 8) -> DataFrame:
    lsalt = left.withColumn("_salt",
                            (F.xxhash64(*left.columns) % salt + salt) % salt)
    replicas = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    rsalt = right.select("*", replicas)
    out = lsalt.join(rsalt, [key, "_salt"]).drop("_salt")
    return out


def key_skew_report(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """(key, n, share, skew_x, rank): the top-N hottest join/window
    keys with their row share and skew factor (n / mean-rows-per-key).
    This is the diagnostic you run BEFORE choosing the knobs the rest
    of this module provides — skew_x >> 1 on a join key means
    ``salted_join`` / AQE skew split; on a window key it means the
    time-bucketed variants (``asof_join_bucketed``,
    ``funnel_user_depth_multipass``).

    One aggregate on the key + a one-row broadcast of the totals;
    top-N is TakeOrderedAndProject. Null keys count as a key (null is
    the classic degenerate hot key — the report must show it, not
    drop it)."""
    from pyspark.sql import Window

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").cast("double").alias("_total"),
        F.count(F.lit(1)).cast("double").alias("_n_keys"))
    top = (counts.crossJoin(F.broadcast(tot))
           .select(key_col, "n",
                   F.round(F.col("n") / F.col("_total"), 6).alias("share"),
                   F.round(F.col("n") * F.col("_n_keys") / F.col("_total"),
                           6).alias("skew_x"))
           .orderBy(F.desc("n"), F.col(key_col))
           .limit(top_n))
    # rank over the already-limited top-N frame (tiny), not the full
    # key space — the global sort never happens
    w = Window.orderBy(F.desc("n"), F.col(key_col))
    return top.withColumn("rank", F.row_number().over(w))
