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
