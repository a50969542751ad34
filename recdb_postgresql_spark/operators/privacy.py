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


def t_closeness_audit(df: DataFrame, quasi_cols: Sequence[str],
                      sensitive_col: str, t: float = 0.2,
                      bins: int = 10) -> DataFrame:
    """(…quasi_cols, class_size, emd, violates): t-closeness (Li,
    Li & Venkatasubramanian 2007) — the audit l-diversity cannot do:
    a class can hold l distinct sensitive values that are all
    SKEWED relative to the table (every salary in the class is in
    the top decile), leaking through distribution, not cardinality.
    Per equivalence class, the Earth Mover's Distance between the
    class's sensitive-value distribution and the GLOBAL one over an
    ordered domain; flag when EMD > ``t``.

    The numeric sensitive column ordinalizes into ``bins``
    equal-width buckets; for an ordered domain of m buckets,
    EMD = (1/(m-1)) * sum_i |cumP_i - cumQ_i| (the standard ordered-
    distance normalization). Work: one (class, bucket) aggregate,
    one broadcast of the m-row global distribution, one cumulative
    window over classes x m rows — class-sized state, never
    row-sized. Counts stay integers to the final divisions: cum
    fractions are exact integer ratios, so the audit reproduces
    cross-engine."""
    cols = list(quasi_cols)
    s = F.col(sensitive_col).cast("double")
    # NULL sensitive values carry no distribution mass to compare:
    # left in, they would land in a NULL _bk bucket the 0..bins-1
    # spine excludes while still inflating class_size and n_tot,
    # sub-normalizing BOTH cumulative distributions and distorting
    # the EMD for classes with NULLs. Audit the non-NULL mass only;
    # class_size below counts the audited rows.
    df = df.where(s.isNotNull())
    rng = df.agg(F.min(s).alias("lo"), F.max(s).alias("hi"))
    d = (df.crossJoin(F.broadcast(rng))
         .withColumn("_bk", F.least(
             F.lit(bins - 1),
             F.floor((s - F.col("lo")) / (F.col("hi") - F.col("lo"))
                     * bins).cast("int"))))
    cls = (d.groupBy(*cols, "_bk")
           .agg(F.count(F.lit(1)).alias("c")))
    glob = d.groupBy("_bk").agg(F.count(F.lit(1)).alias("gc"))
    n_tot = d.count()
    # dense (class x bucket) grid so zero buckets participate in the
    # cumulative sums — grid is classes x bins, metadata-sized
    classes = cls.groupBy(*cols).agg(F.sum("c").alias("class_size"))
    spark = df.sparkSession
    spine = (classes.crossJoin(
        spark.range(bins).select(F.col("id").cast("int").alias("_bk"))))
    grid = (spine.join(cls, cols + ["_bk"], "left")
            .na.fill({"c": 0})
            .join(F.broadcast(glob), "_bk", "left")
            .na.fill({"gc": 0}))
    from pyspark.sql import Window

    w = (Window.partitionBy(*cols).orderBy("_bk")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (grid
           .withColumn("_cp", F.sum("c").over(w))
           .withColumn("_cq", F.sum("gc").over(w)))
    term = F.abs(F.col("_cp") / F.col("class_size")
                 - F.col("_cq") / F.lit(float(n_tot)))
    emd = (cum.groupBy(*cols, "class_size")
           .agg((F.sum(F.round(term * F.lit(1e15), 0).cast("long"))
                 / F.lit(1e15) / F.lit(float(bins - 1))).alias("emd")))
    return emd.select(*cols, "class_size",
                      F.round("emd", 6).alias("emd"),
                      (F.col("emd") > t).alias("violates"))
