"""Table profiling — the ANALYZE / pg_statistic analog.

PostgreSQL's ANALYZE (the reference inherits it unchanged) samples a
table into per-column statistics (null fraction, n_distinct, common
values, histogram bounds) that drive the planner. The Spark-side
equivalent is a profiling pass the pipeline runs on every new corpus
drop: the same statistics, computed exactly or by sketch, emitted as
data (long-format rows) rather than into a catalog.

Scale shape: ALL columns' statistics compute in ONE aggregation job —
a single scan, map-side partial aggregation, one single-row result
that explodes to long format driver-free. The exact path uses
``percentile`` (sort-based) and ``count_distinct`` (Expand), which is
fine up to ~billions of rows per column; the sketch path swaps in
``approx_percentile`` + ``approx_count_distinct`` (constant-size
mergeable sketches — the 100 TB default, same switch as
``quality_filter``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str],
                  quantiles: Sequence[float] = (0.25, 0.5, 0.75),
                  exact: bool = True) -> DataFrame:
    """(column, stat, value): per-column n_rows / n_notnull /
    n_distinct / min / max / mean / q25... for numeric-castable
    columns. ``exact=True`` is oracle-reproducible; ``exact=False``
    swaps quantiles and distinct counts for sketches (the scale
    path — values then approximate, everything else identical)."""
    aggs = [F.count(F.lit(1)).cast("double").alias("__n_rows")]
    stats: list[tuple[str, str]] = []
    for c in columns:
        col = F.col(c).cast("double")
        ndist = (F.count_distinct(F.col(c)) if exact
                 else F.approx_count_distinct(F.col(c), rsd=0.02))
        aggs += [
            F.count(col).cast("double").alias(f"{c}__n_notnull"),
            ndist.cast("double").alias(f"{c}__n_distinct"),
            F.min(col).alias(f"{c}__min"),
            F.max(col).alias(f"{c}__max"),
            F.avg(col).alias(f"{c}__mean"),
        ]
        stats += [(c, s) for s in
                  ("n_notnull", "n_distinct", "min", "max", "mean")]
        for q in quantiles:
            name = f"q{int(round(q * 100))}"
            expr = (F.percentile(col, F.lit(q)) if exact
                    else F.percentile_approx(col, F.lit(q), F.lit(10000)))
            aggs.append(expr.alias(f"{c}__{name}"))
            stats.append((c, name))
    wide = df.agg(*aggs)
    entries = [F.struct(F.lit(c).alias("column"), F.lit("n_rows").alias("stat"),
                        F.col("__n_rows").alias("value"))
               for c in columns]
    entries += [F.struct(F.lit(c).alias("column"), F.lit(s).alias("stat"),
                         F.col(f"{c}__{s}").alias("value"))
                for c, s in stats]
    return (wide.select(F.explode(F.array(*entries)).alias("e"))
            .select("e.column", "e.stat",
                    F.round("e.value", 6).alias("value")))


def winsorize(df: DataFrame, val_col: str = "value",
              group_col: str = "event_type", lo: float = 0.05,
              hi: float = 0.95, exact: bool = True,
              accuracy: int = 10000) -> DataFrame:
    """Per-group winsorization: clip ``val_col`` to that group's
    [lo, hi] quantiles — the standard outlier treatment before
    training on heavy-tailed metrics (a fat-finger 1e9 purchase value
    otherwise owns the loss).

    The bounds table is one row per group (a broadcast); clipping is a
    map-side least/greatest — the data itself never shuffles.
    ``exact=True`` computes interpolated percentiles (a per-group sort
    — the oracle-checkable path); ``exact=False`` swaps in
    approx_percentile's constant-size sketch, the 100 TB form (same
    switch as ``profile_table``).

    NULL groups are first-class: the join is null-safe, so rows whose
    ``group_col`` is NULL clip against the NULL group's own bounds
    instead of silently dropping (groupBy emits a NULL-group row). A
    row whose group has no usable bounds (e.g. all values NULL) passes
    through unclipped rather than vanishing."""
    pct = (F.percentile(F.col(val_col), F.lit([lo, hi])) if exact
           else F.percentile_approx(F.col(val_col), F.lit([lo, hi]),
                                    F.lit(accuracy)))
    bounds = df.groupBy(group_col).agg(pct.alias("_b"))
    bounds = bounds.select(F.col(group_col).alias("_g"),
                           F.col("_b")[0].alias("_lo"),
                           F.col("_b")[1].alias("_hi"))
    clipped = F.least(F.greatest(F.col(val_col), F.col("_lo")), F.col("_hi"))
    return (df.join(F.broadcast(bounds),
                    F.col(group_col).eqNullSafe(F.col("_g")), "left")
            .withColumn("clipped",
                        F.round(F.coalesce(clipped, F.col(val_col)), 6))
            .drop("_g", "_lo", "_hi"))


def profile_drift(old: DataFrame, new: DataFrame, columns,
                  quantiles=(0.25, 0.5, 0.75),
                  exact: bool = True) -> DataFrame:
    """(column, stat, old_value, new_value, abs_change, rel_change):
    distribution-drift report between two snapshots of a table — the
    data-contract check a pipeline runs before promoting a rebuild
    (did the null rate spike? did the median move?). rel_change is
    NULL when the old value is 0 (no meaningful ratio), never a
    division blow-up.

    Scale shape: two independent ``profile_table`` passes (one
    aggregation job each) joined on ~|columns| x |stats| rows — the
    join input is stats-sized, never data-sized. Pair with
    ``EventStore`` time travel to diff a table against its own
    version N, like ``dedup.corpus_diff`` does for content."""
    po = profile_table(old, columns, quantiles, exact) \
        .withColumnRenamed("value", "old_value")
    pn = profile_table(new, columns, quantiles, exact) \
        .withColumnRenamed("value", "new_value")
    delta = F.col("new_value") - F.col("old_value")
    return (po.join(pn, ["column", "stat"])
            .select("column", "stat", "old_value", "new_value",
                    F.round(delta, 6).alias("abs_change"),
                    F.round(delta / F.nullif(F.abs("old_value"),
                                             F.lit(0.0)), 6)
                    .alias("rel_change")))


def psi_drift(old: DataFrame, new: DataFrame, val_col: str = "value",
              bins: int = 10) -> DataFrame:
    """(bin, n_old, n_new, old_share, new_share, psi_term): population
    stability index between a baseline snapshot and a new one — the
    standard model-monitoring drift score (PSI < 0.1 stable, > 0.25
    action). Total PSI = SUM(psi_term).

    Binning: ``bins`` equal-width buckets over the BASELINE min/max
    (the convention — the baseline defines the expected distribution);
    new values outside the baseline range clamp into the edge buckets,
    so range drift shows up as edge-bucket mass, not dropped rows.
    Shares are Laplace-smoothed ((n + 0.5) / (N + 0.5 * bins)) so an
    empty bucket never produces log(0).

    Scale shape: one min/max aggregate over the baseline (single-row
    broadcast), then one map-side bucket assignment + one count
    aggregate per side — two scans total, join input is bins-sized.
    Determinism: bucket arithmetic is IEEE ops on identical doubles;
    ln at 6-dp rounding is cross-engine-stable (same class as the
    perplexity operator)."""
    if bins < 2:
        raise ValueError("bins must be >= 2")
    rng = old.agg(F.min(F.col(val_col).cast("double")).alias("lo"),
                  F.max(F.col(val_col).cast("double")).alias("hi"))

    def bucketed(df, n_name):
        v = F.col(val_col).cast("double")
        w = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
        b = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(F.lit(bins - 1),
                    F.greatest(F.lit(0),
                               F.floor((v - F.col("lo")) / w)
                               .cast("int"))))
        return (df.where(v.isNotNull())
                .crossJoin(F.broadcast(rng))
                .select(b.alias("bin"))
                .groupBy("bin").agg(F.count(F.lit(1)).alias(n_name)))

    all_bins = (old.sparkSession.range(bins)
                .select(F.col("id").cast("int").alias("bin")))
    counts = (all_bins
              .join(bucketed(old, "n_old"), "bin", "left")
              .join(bucketed(new, "n_new"), "bin", "left")
              .select("bin",
                      F.coalesce("n_old", F.lit(0)).alias("n_old"),
                      F.coalesce("n_new", F.lit(0)).alias("n_new")))
    tot = counts.agg(F.sum("n_old").alias("t_old"),
                     F.sum("n_new").alias("t_new"))
    smooth = F.lit(0.5 * bins)
    p_old = ((F.col("n_old") + F.lit(0.5))
             / (F.col("t_old") + smooth))
    p_new = ((F.col("n_new") + F.lit(0.5))
             / (F.col("t_new") + smooth))
    return (counts.crossJoin(F.broadcast(tot))
            .select("bin",
                    F.col("n_old").cast("long").alias("n_old"),
                    F.col("n_new").cast("long").alias("n_new"),
                    F.round(p_old, 6).alias("old_share"),
                    F.round(p_new, 6).alias("new_share"),
                    F.round((p_new - p_old) * F.log(p_new / p_old), 6)
                    .alias("psi_term")))


def corr_matrix(df: DataFrame, columns) -> DataFrame:
    """(col_a, col_b, corr, n): pairwise Pearson correlations over
    ``columns`` in ONE aggregation pass (upper triangle incl.
    diagonal) — the numeric-relationship profile beside
    ``profile_table``'s univariate one.

    All k(k+1)/2 correlations derive from the algebraic sums
    (n, sum_x, sum_xx, sum_xy) of a single scan: map-side partial
    aggregation, one reduced row, exploded to long format driver-free.
    Rows with a NULL in any profiled column drop (pairwise-complete
    would need per-pair counts; listwise is the deterministic
    contract)."""
    cols = list(columns)
    d = df.na.drop(subset=cols)
    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    for c in cols:
        x = F.col(c).cast("double")
        aggs.append(F.sum(x).alias(f"_s_{c}"))
        aggs.append(F.sum(x * x).alias(f"_ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(F.col(a).cast("double")
                              * F.col(b).cast("double"))
                        .alias(f"_sxy_{a}__{b}"))
    wide = d.agg(*aggs)
    n = F.col("_n")

    def corr_expr(a: str, b: str):
        if a == b:
            return F.lit(1.0)
        sx, sy = F.col(f"_s_{a}"), F.col(f"_s_{b}")
        sxx, syy = F.col(f"_ss_{a}"), F.col(f"_ss_{b}")
        sxy = F.col(f"_sxy_{a}__{b}")
        cov = sxy - sx * sy / n
        vx = sxx - sx * sx / n
        vy = syy - sy * sy / n
        return cov / F.sqrt(vx * vy)

    entries = [F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                        corr_expr(a, b).alias("corr"))
               for i, a in enumerate(cols) for b in cols[i:]]
    return (wide.select(n.cast("long").alias("n"),
                        F.explode(F.array(*entries)).alias("e"))
            .select("e.col_a", "e.col_b",
                    F.round("e.corr", 6).alias("corr"), "n"))


def validate(df: DataFrame, rules) -> DataFrame:
    """(rule, violations, n_rows, pass): data-contract validation —
    the dbt-test / expectations pass a pipeline runs before
    publishing a table. ``rules`` is a list of (name, condition)
    where condition is a boolean Column that is TRUE when the ROW
    VIOLATES the rule; all rules evaluate in ONE aggregation pass
    (conditional sums — map-side collapsed, one reduced row exploded
    to long format driver-free).

    Uniqueness/freshness-style rules that need aggregation context
    cannot be a per-row predicate; express them upstream (e.g. join
    a count>1 flag) or check them with their own aggregate."""
    conds = list(rules)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in conds:
        aggs.append(F.sum(F.when(cond, 1).otherwise(0))
                    .alias(f"_v_{name}"))
    wide = df.agg(*aggs)
    entries = [F.struct(F.lit(name).alias("rule"),
                        F.col(f"_v_{name}").alias("violations"))
               for name, _ in conds]
    return (wide.select(F.col("_n").alias("n_rows"),
                        F.explode(F.array(*entries)).alias("e"))
            .select("e.rule", F.col("e.violations").cast("long")
                    .alias("violations"), "n_rows",
                    (F.col("e.violations") == 0).alias("pass")))


def table_fingerprint(df: DataFrame, key: Column,
                      columns: Sequence[str],
                      n_buckets: int = 64) -> DataFrame:
    """Order-independent content fingerprint of a table, bucketed by
    the key hash: (bucket, n_rows, xor_sig) where xor_sig is the XOR
    of every row's 60-bit md5 over its canonicalized column values —
    the cross-system reconciliation primitive. Two copies of a table
    (source PG vs the lake, pre- vs post-migration, replica vs
    primary) compare by shipping n_buckets rows instead of the data;
    a mismatched bucket narrows the diff to 1/n_buckets of the table,
    and recursing on the mismatched bucket binary-searches the
    offending rows without ever moving the table.

    XOR (not SUM) so the aggregate is overflow-free, commutative,
    associative, and self-inverse — map-side partial combine is
    exact, and bucket signatures are insensitive to row order and
    partitioning. Column values canonicalize via cast-to-string with
    NULL coalesced to the sentinel '\\N' (concat_ws would silently
    SKIP nulls, making ('a', NULL) collide with ('a',)).

    Scale shape: one pass, one n_buckets-row aggregate; everything
    combines map-side. At 100 TB this is THE way to answer "are
    these two tables identical" without a join.
    """
    from recdb_postgresql_spark.functions.hashing import md5_long

    row_repr = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\\N"))
               for c in columns])
    sig = md5_long(row_repr)
    bucket = F.pmod(md5_long(key.cast("string")), F.lit(n_buckets))
    return (df.select(bucket.alias("bucket"), sig.alias("sig"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.bit_xor("sig").alias("xor_sig"))
            .orderBy("bucket"))


def fd_audit(df: DataFrame, fds) -> DataFrame:
    """Functional-dependency audit: for each candidate FD
    ``(name, [determinant cols], dependent col)``, does determinant ->
    dependent hold, and how badly not — the schema-inference /
    data-quality primitive (Papenbrock et al.'s FD-discovery metrics)
    behind "is this column derivable", "is this a safe join key",
    "did denormalization drift".

    Reports the standard g3 error: the minimum number of rows to
    DELETE for the FD to hold (n - sum over determinant groups of the
    group's majority dependent count), plus group counts and
    confidence = 1 - g3/n. NULL determinants/dependents group as
    ordinary values (SQL GROUP BY semantics — an all-NULL dependent
    still functionally determines).

    Shape per FD: one (det, dep) aggregate with map-side combine,
    one det-keyed re-aggregate, one scalar finisher — two shuffles of
    distinct-pair rows, never a self-join. FDs audit independently
    (different keys), so the result is a union of one-row reports."""
    outs = []
    for name, det, dep in fds:
        pairs = (df.groupBy(*det, dep)
                 .agg(F.count(F.lit(1)).alias("c")))
        per_det = (pairs.groupBy(*det)
                   .agg(F.sum("c").alias("n"), F.max("c").alias("mx"),
                        F.count(F.lit(1)).alias("ndep")))
        agg = per_det.agg(
            F.sum("n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("ndep") > 1, 1).otherwise(0))
             .cast("long").alias("violating_groups"),
            F.sum(F.col("n") - F.col("mx")).alias("g3_rows"))
        outs.append(agg.select(
            F.lit(name).alias("fd"), "n_rows", "n_groups",
            "violating_groups", "g3_rows",
            (F.col("g3_rows") == 0).alias("holds"),
            F.round(F.lit(1.0) - F.col("g3_rows") / F.col("n_rows"), 6)
             .alias("confidence")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def impute_group_median(df: DataFrame, group_col: str, val_col: str,
                        out_col: str | None = None) -> DataFrame:
    """Data repair: fill NULLs in ``val_col`` with the GROUP median,
    falling back to the global median for groups that are entirely
    NULL — the imputation that respects per-segment location instead
    of dragging every gap to the corpus mean; adds ``was_imputed``
    for downstream honesty (an imputed value should never silently
    count as observed).

    Two exact-percentile aggregates (group-sized + one global row)
    broadcast back onto the facts — no fact shuffle; swap in
    ddq_quantiles per group at extreme group cardinalities (the
    mad_outliers note applies verbatim)."""
    out = out_col or val_col
    v = F.col(val_col).cast("double")
    med = (df.groupBy(F.col(group_col).alias("_g"))
           .agg(F.expr(f"percentile({val_col}, 0.5D)").alias("_gm")))
    gm = df.agg(F.expr(f"percentile({val_col}, 0.5D)").alias("_all_m"))
    j = (df.join(F.broadcast(med),
                 F.col(group_col).eqNullSafe(F.col("_g")), "left")
         .drop("_g").crossJoin(F.broadcast(gm)))
    filled = F.coalesce(v, F.col("_gm"), F.col("_all_m"))
    return (j.withColumn("was_imputed", v.isNull())
            .withColumn(out, filled)
            .drop("_gm", "_all_m"))
