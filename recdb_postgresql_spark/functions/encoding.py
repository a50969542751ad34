"""Leakage-free categorical feature encoding.

Target encoding replaces a categorical key with a statistic of the
label over that key — the workhorse categorical feature for tabular
models. Done naively (group mean joined back) every row sees its OWN
label through the group mean: leakage that inflates offline metrics
and dies in production. The leave-one-out (LOO) form removes the row's
own contribution in closed form:

    loo_mean(row) = (sum(y over key) - y_row) / (count(key) - 1)

which is exactly the K-fold-at-K=n estimate, computed in ONE window
pass — no fold loop, no shuffle per fold. Singleton keys (count == 1)
have no leave-one-out information and fall back to the global prior.

The smoothed variant shrinks small keys toward the prior (classic
empirical-Bayes / Micci-Barreca 2001 form):

    smooth(row) = (sum - y_row + m * prior) / (count - 1 + m)

Scale shape: one hash-partitioned window over the key (equivalently a
groupBy + broadcast-back when keys are few) — a single shuffle on the
encoding key regardless of key cardinality; no iteration, no driver
state. For exact cross-engine parity feed an INTEGER target (e.g.
price in cents): group sums stay exact int64 and the final division is
one deterministic double op.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode_loo(df: DataFrame, key_cols: Sequence[str],
                      target_col: str, smoothing_m: float = 0.0,
                      out_col: str = "te_loo",
                      smooth_col: str = "te_smooth",
                      prior: Optional[float] = None) -> DataFrame:
    """Append leave-one-out target encoding of ``key_cols``.

    Adds ``out_col`` (pure LOO mean; global mean for singleton keys)
    and, when ``smoothing_m > 0``, ``smooth_col`` (LOO shrunk toward
    the global mean with pseudo-count ``m``). The target is summed
    as-is — pass an integral column (cents, counts) when exact
    cross-engine reproducibility matters.

    ``prior`` overrides the computed global mean — pass the TRAINING
    split's prior when encoding a serving/eval split (computing it
    from the encoded split would leak), or an integer-valued prior to
    keep every emitted value an exact ratio of integers (the
    bit-reproducibility pattern the oracle queries use: with integral
    target, integral prior, and integral ``m``, each output is ONE
    IEEE division of exactly-represented values — no rounding needed,
    no engine-specific ROUND boundary behavior to fight).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys)
    y = F.col(target_col)
    df = (df.withColumn("_te_sum", F.sum(y).over(w))
            .withColumn("_te_cnt", F.count(y).over(w)))
    if prior is not None:
        df = df.withColumn("_te_prior", F.lit(float(prior)))
    else:
        # Global prior from the already-computed per-key rollup
        # (tiny: one row per key) — broadcast join, no second pass.
        totals = (df.groupBy(*keys)
                    .agg(F.first("_te_sum").alias("s"),
                         F.first("_te_cnt").alias("c"))
                    .agg((F.sum("s") / F.sum("c")).alias("_te_prior")))
        df = df.join(F.broadcast(totals))
    loo = F.when(F.col("_te_cnt") > 1,
                 (F.col("_te_sum") - y) / (F.col("_te_cnt") - 1)
                 ).otherwise(F.col("_te_prior"))
    df = df.withColumn(out_col, loo)
    if smoothing_m > 0:
        m = F.lit(float(smoothing_m))
        df = df.withColumn(
            smooth_col,
            (F.col("_te_sum") - y + m * F.col("_te_prior"))
            / (F.col("_te_cnt") - 1 + m))
    return df.drop("_te_sum", "_te_cnt", "_te_prior")


def quantile_normalize(df: DataFrame, group_col: str, val_col: str,
                       id_col: str, out_col: str = "qnorm") -> DataFrame:
    """Map every group's value distribution onto the POOLED empirical
    distribution (quantile normalization — the batch-effect remover:
    after it, every group has identical marginals, so cross-group
    comparisons see rank structure, not scale/shift artifacts).

    Row with within-group rank r of n_g maps to the pooled sorted
    value at position floor((r-1) * (N-1) / (n_g-1)) (lower empirical
    quantile; singleton groups map to the pooled median position) —
    ALL index arithmetic is exact integer division, and the output
    values are copied from the pooled column untouched, so the
    transform is bit-portable across engines.

    Scale shape: the per-group rank is a partitioned window (fully
    distributed); the pooled order is ONE global row_number over N
    rows — the zipWithIndex shape. At 100 TB replace the pooled side
    with a fixed-resolution quantile grid (the group side and the
    join are unchanged); at feature-table scales the exact pooled
    sort is one range-partitioned pass.
    """
    from pyspark.sql import Window

    n_total = df.count()
    gw = Window.partitionBy(group_col).orderBy(val_col, id_col)
    ranked = (df.withColumn("_qr", F.row_number().over(gw))
                .withColumn("_qn", F.count(F.lit(1)).over(
                    Window.partitionBy(group_col))))
    pos = F.when(
        F.col("_qn") > 1,
        F.expr(f"(_qr - 1) * ({n_total} - 1) div (_qn - 1)")
    ).otherwise(F.lit((n_total - 1) // 2))
    ranked = ranked.withColumn("_qpos", pos.cast("long"))
    pooled = (df.select(F.col(val_col).alias("_pv"),
                        F.col(id_col).alias("_pid"))
              .withColumn("_prn", F.row_number().over(
                  Window.orderBy("_pv", "_pid")) - 1))
    return (ranked.join(pooled.select("_prn", "_pv"),
                        ranked["_qpos"] == pooled["_prn"])
            .withColumn(out_col, F.col("_pv"))
            .drop("_qr", "_qn", "_qpos", "_prn", "_pv"))
