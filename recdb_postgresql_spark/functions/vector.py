"""Vector math over ``array<float>`` embedding columns — pure Catalyst
expressions (``aggregate``/``zip_with`` higher-order functions), no
Python UDFs in the hot path.

The fold is sequential over the array, so the floating-point
accumulation order is deterministic and matches a sequential oracle
(DuckDB list functions) to double precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
