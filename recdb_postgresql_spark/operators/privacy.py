"""Privacy audits over fact tables.

Training-data pipelines ship user-derived tables; before a table
leaves the boundary the standard questions are k-anonymity (is any
quasi-identifier combination rare enough to fingerprint someone?) and
l-diversity (within each combination, is the sensitive attribute
varied enough that membership reveals nothing?). Both are single
aggregation passes — the audit never costs more than one scan, and
the report is equivalence-class-sized, not row-sized.

This complements (not replaces) `operators/text.redact_pii`, which
scrubs literal identifiers from free text; these audits govern the
STRUCTURED columns that survive redaction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(df: DataFrame, quasi_cols: Sequence[str],
                      k: int = 5) -> DataFrame:
    """(…quasi_cols, class_size, violates): one row per equivalence
    class (distinct quasi-identifier combination) with its row count,
    flagged when smaller than ``k`` — the classes an attacker can
    pin to few individuals. NULL quasi-values form their own class
    (a NULL zip code is itself identifying information).

    One map-side-combined groupBy; the report is class-count-sized.
    The table's k-anonymity IS the min class_size — derivable from
    this output with one more tiny aggregate."""
    cols = list(quasi_cols)
    return (df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("class_size"))
            .withColumn("violates", F.col("class_size") < k))


def l_diversity_audit(df: DataFrame, quasi_cols: Sequence[str],
                      sensitive_col: str, l: int = 2) -> DataFrame:
    """(…quasi_cols, class_size, n_sensitive, violates): distinct
    l-diversity — per equivalence class, how many DISTINCT sensitive
    values appear; a class with fewer than ``l`` lets an attacker
    infer the sensitive attribute from the quasi-identifiers alone
    even when k-anonymity holds.

    One aggregate with a count_distinct (the Expand is per-class and
    bounded by the sensitive domain); swap in approx_count_distinct
    at 100 TB if the sensitive domain is large (the violation flag
    only needs resolution near ``l``)."""
    cols = list(quasi_cols)
    return (df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("class_size"),
                 F.count_distinct(F.col(sensitive_col))
                  .alias("n_sensitive"))
            .withColumn("violates", F.col("n_sensitive") < l))


def generalize(col, width: float):
    """Map a numeric column onto ``width``-sized buckets (the label is
    the bucket's lower bound) — the standard generalization move that
    repairs k-anonymity violations by coarsening quasi-identifiers.
    Pure map-side arithmetic; re-audit after applying."""
    return (F.floor(col / F.lit(width)) * F.lit(width))
