"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-dependent per partition layout, so two runs (or
two engines) disagree row-by-row — useless for reproducible corpus
construction or oracle checking. Hash sampling decides per ROW from a
stable key: a row is in the sample iff md5(key) mod M < fraction * M.
Properties a 100 TB pipeline needs:

- reproducible across runs, partitionings, engines (md5 is md5);
- composable: the same row set is selected no matter how the data is
  split or ordered — sampling commutes with repartition/union;
- incremental: new data samples itself consistently (no global pass);
- per-group caps use the same hash as a deterministic priority, so
  "at most N docs per language" is one window, no RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from recdb_postgresql_spark.functions.hashing import md5_long

_MOD = 1_000_000


def hash_bucket(key: Column, mod: int = _MOD) -> Column:
    """Stable bucket in [0, mod) from the row key."""
    return md5_long(key.cast("string")) % mod


def hash_sample(df: DataFrame, key: Column, fraction: float) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    falls under fraction * MOD. Exact same rows every run/engine."""
    return df.where(hash_bucket(key) < int(round(fraction * _MOD)))


def group_cap(df: DataFrame, group_col: str, key: Column,
              max_rows: int) -> DataFrame:
    """Deterministically keep at most ``max_rows`` rows per group,
    prioritized by the row-key hash (unbiased w.r.t. any value column).
    One window over the group key — the same pattern as
    ``cf.cap_coraters`` minus the hot/cold split (use that one when a
    pushdown-sensitive query follows)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(hash_bucket(key), key)
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_rows).drop("_rn"))


def hash_split(df: DataFrame, key: Column,
               fractions: dict[str, float] | None = None,
               split_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: adds ``split_col``
    holding the name whose cumulative hash-bucket range contains
    md5(key) % MOD. Properties inherited from hash_bucket: the same
    row lands in the same split across runs, partitionings, engines,
    and incremental appends — the reproducible-corpus version of
    ``randomSplit`` (which is seed- and partition-layout-dependent).
    Map-only: no shuffle, no global pass; fractions are enforced in
    expectation per row, exactly as a 100 TB pipeline wants (a global
    exact-count split would need a total order).

    ``fractions`` is an ordered name -> fraction mapping; entries are
    assigned consecutive bucket ranges in insertion order and must sum
    to <= 1.0 (any remainder falls into the LAST split, keeping every
    row assigned)."""
    if fractions is None:
        fractions = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1.0")
    b = hash_bucket(key)
    names = list(fractions)
    expr: Column = F.lit(names[-1])  # remainder -> last split
    cum = 0.0
    bounds = []
    for name, frac in fractions.items():
        cum += frac
        bounds.append((name, int(round(cum * _MOD))))
    for name, hi in reversed(bounds[:-1]):
        expr = F.when(b < hi, F.lit(name)).otherwise(expr)
    # first range wins automatically: WHEN clauses are ordered low->high
    return df.withColumn(split_col, expr)


def stratified_sample(df: DataFrame, group_col: str, key: Column,
                      fractions: dict[str, float],
                      default: float = 1.0) -> DataFrame:
    """Per-group deterministic hash sample — the data-mixing lever
    (downsample over-represented languages/sources to a target blend).
    Groups absent from ``fractions`` keep ``default`` of their rows.
    Map-only like ``hash_sample`` (the per-group threshold is a CASE
    expression, no join), with all its properties: reproducible across
    runs/partitionings/engines and composable with incremental
    appends. Unlike ``df.sampleBy``, two engines agree row-by-row."""
    b = hash_bucket(key)
    # round-to-nearest (not truncate): 6-decimal fractions times 1e6
    # can land a hair below the intended integer in double arithmetic.
    thr: Column = F.lit(int(round(default * _MOD)))
    for g, frac in fractions.items():
        thr = F.when(F.col(group_col) == g,
                     F.lit(int(round(frac * _MOD)))).otherwise(thr)
    return df.where(b < thr)


def weighted_sample(df: DataFrame, weight: Column, key: Column,
                    k: int) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): each row draws u from its key hash
    (uniform in (0,1), reproducible across engines) and gets priority
    u^(1/w); the k highest priorities are the sample. Selection
    probability is proportional to weight; rows with non-positive
    weight are excluded.

    The DSIR closing step: feed ``exp(log_weight)`` from
    ``importance_weights`` and the sampled corpus follows the target
    distribution. Scale shape: one map pass computes priorities, the
    global top-k is orderBy+limit = TakeOrderedAndProject
    (per-partition heaps) — no shuffle of the data, no RNG state, and
    the same rows win under any partitioning."""
    u = (hash_bucket(key).cast("double") + 0.5) / _MOD
    pri = F.pow(u, 1.0 / weight)
    return (df.where(weight > 0)
            .withColumn("_pri", pri)
            .orderBy(F.desc("_pri"), key)  # key breaks exact-pri ties
            .limit(k)
            .drop("_pri"))


def temperature_fractions(df: DataFrame, group_col: str,
                          alpha: float = 0.5,
                          target_rows: int | None = None) -> DataFrame:
    """(group, n, fraction): per-group KEEP fractions under
    TEMPERATURE sampling (the multilingual-LM mixing standard —
    mBERT/XLM-R/mT5): sampling probability q_g ∝ p_g^alpha, where p_g
    is the group's corpus share. alpha=1 keeps the natural
    distribution; alpha->0 approaches uniform-over-groups; 0.3-0.7 is
    the usual range that keeps head languages from drowning the tail.

    ``target_rows`` sets the expected output size (default: the corpus
    size — pure re-balancing). Fractions cap at 1.0 — temperature
    UP-sampling of tail groups (repeating epochs) is a training-loop
    concern; pair with ``weighted_sample`` when true upsampling is
    needed. One tiny groupBy produces the fraction table (group-count
    rows — broadcastable metadata)."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("_tot"),
                     F.sum(F.pow(F.col("n"), F.lit(float(alpha))))
                     .alias("_z"))
    frac_raw = (F.coalesce(F.lit(target_rows).cast("double"),
                           F.col("_tot"))
                * F.pow(F.col("n"), F.lit(float(alpha)))
                / F.col("_z") / F.col("n"))
    return (counts.crossJoin(F.broadcast(tot))
            .select(group_col, "n",
                    F.round(F.least(F.lit(1.0), frac_raw), 6)
                    .alias("fraction")))


def temperature_mix(df: DataFrame, group_col: str, key: Column,
                    alpha: float = 0.5,
                    target_rows: int | None = None) -> DataFrame:
    """Apply ``temperature_fractions`` with the deterministic
    hash-threshold rule: keep rows whose md5 bucket falls under their
    group's fraction — reproducible across runs, partitionings,
    engines, and appends (the ``stratified_sample`` contract with the
    fractions COMPUTED from corpus statistics instead of passed in).
    The fraction table joins as a broadcast (group-count rows); the
    scan stays one pass."""
    fr = temperature_fractions(df, group_col, alpha, target_rows)
    b = hash_bucket(key)
    # Round-to-nearest before the integer compare: fraction is already
    # round(.,6) so fraction*_MOD is mathematically integral, but the
    # double can land just BELOW the integer (0.437816*1e6 =
    # 437815.99999...). A truncating cast would keep one bucket fewer
    # than an engine that rounds — a 1-in-100 latent parity break.
    thr = F.round(F.col("fraction") * _MOD, 0).cast("long")
    return (df.join(F.broadcast(fr.select(group_col, "fraction")),
                    group_col)
            .where(b < thr)
            .drop("fraction"))


def stratified_sample_exact(df: DataFrame, stratum_col: str,
                            key: Column, total_n: int) -> DataFrame:
    """Exactly ``total_n`` rows, allocated across strata by the
    largest-remainder (Hamilton) method and chosen within each
    stratum by hash priority — "give me a 100k-document sample that
    preserves the language mix" with EXACT counts, deterministically.

    hash_sample keeps fractions only in expectation; this pays one
    per-stratum window for exact counts. Allocation is pure integer
    arithmetic (quota floor + largest remainder, stratum-value
    tiebreak), so the selected row SET is identical across runs,
    partitionings, and engines. Strata smaller than their allocation
    contribute everything they have (the sample then undershoots
    total_n — surfaced, not silently rebalanced: silent respill would
    change other strata's membership when one stratum shrinks).

    Scale shape: one count aggregate (stratum-sized), the allocation
    window over THAT rollup (driver-free, stratum-count rows), one
    broadcast join back, one per-stratum priority window — the
    group_cap pattern with computed caps.
    """
    from pyspark.sql import Window

    if total_n <= 0:
        raise ValueError("total_n must be positive")
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    tot = counts.agg(F.sum("_n").alias("_tot"))
    # quota = total_n * n_h / N; base = floor, remainder ranks pick up
    # the leftover units (largest remainder, stratum-value tiebreak)
    alloc = (counts.join(F.broadcast(tot))
             .withColumn("_base", F.expr(f"({total_n} * _n) div _tot"))
             .withColumn("_rem", F.expr(f"({total_n} * _n) % _tot")))
    rw = Window.orderBy(F.desc("_rem"), F.col(stratum_col))
    alloc = (alloc
             .withColumn("_rrank", F.row_number().over(rw))
             .withColumn("_spare", F.lit(total_n) - F.sum("_base").over(
                 Window.rowsBetween(Window.unboundedPreceding,
                                    Window.unboundedFollowing)))
             .withColumn("_k", F.col("_base")
                         + (F.col("_rrank") <= F.col("_spare"))
                         .cast("long"))
             .select(stratum_col, "_k"))
    w = Window.partitionBy(stratum_col).orderBy(hash_bucket(key), key)
    return (df.join(F.broadcast(alloc), stratum_col)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= F.col("_k"))
            .drop("_rn", "_k"))
