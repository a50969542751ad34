"""MERGE (upsert) as a pure DataFrame transform.

PostgreSQL 9.2 (the reference's base) predates MERGE, but every
warehouse user of the reference runs the upsert pattern by hand
(UPDATE + INSERT WHERE NOT EXISTS); Delta/Iceberg made MERGE INTO the
canonical ingest statement. This module provides the engine-side
equivalent: ``merge_into`` computes the merged relation lazily (one
full-outer join on the keys — Catalyst broadcasts a small source
automatically, AQE handles skew), and ``sources.event_store.
EventStore.merge`` applies it transactionally (copy-on-write,
partition-scoped when the store is partitioned).

The whole transform is plain Catalyst (presence flags + per-column
CASE), so it is oracle-checkable in ANSI SQL and runs entirely inside
whole-stage codegen.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(target: DataFrame, source: DataFrame, keys: Sequence[str],
               update_cols: Optional[Sequence[str]] = None,
               insert: bool = True,
               delete_col: Optional[str] = None,
               update_exprs: Optional[Mapping] = None) -> DataFrame:
    """MERGE semantics as a lazy DataFrame: returns the post-merge
    relation with the TARGET's schema.

    - matched (key in both) -> target row with ``update_cols`` taken
      from the source (default: every shared non-key column)
    - matched AND source's ``delete_col`` is true -> row dropped
      (CDC-style tombstone)
    - source-only -> inserted when ``insert=True`` (target columns the
      source lacks become NULL); a source-only tombstone inserts
      nothing
    - target-only -> passes through untouched

    ``update_exprs`` upgrades matched updates from replacement to
    COMPUTED merges (Delta's ``whenMatchedUpdate(set=...)``): a map of
    column -> ``lambda t, s: ...`` where ``t``/``s`` are accessors for
    the target/source value of any column — e.g. ``{"n": lambda t, s:
    t("n") + s("n")}`` turns MERGE into the additive rollup
    maintenance step (the continuous-aggregate pattern: micro-batch
    partial aggregates merge into a summary table). Columns named in
    ``update_exprs`` need not exist in the source at all; inserts
    still take the source value (or NULL if absent).

    PRECONDITION: ``keys`` must be unique within ``source`` (one
    action per key — the same contract Delta's MERGE enforces at run
    time); duplicate source keys would fan out matched target rows.
    Keys match null-safely, so a NULL key upserts its own row rather
    than silently inserting forever.

    Scale shape: ONE join on the keys — no collect, no window. The
    per-column CASE arms are codegen'd; at 100 TB the cost is the key
    shuffle (or none, if the source broadcasts)."""
    tcols = list(target.columns)
    scols = [c for c in source.columns if c != delete_col]
    update_exprs = dict(update_exprs or {})
    if update_cols is None:
        update_cols = [c for c in scols if c in tcols and c not in keys
                       and c not in update_exprs]
    missing = [c for c in update_cols if c not in scols or c not in tcols]
    if missing:
        raise ValueError(f"update_cols not in both schemas: {missing}")
    bad = [c for c in update_exprs if c not in tcols or c in keys]
    if bad:
        raise ValueError(f"update_exprs must target non-key target "
                         f"columns: {bad}")
    t = target.select(
        *[F.col(c).alias(f"_t_{c}") for c in tcols],
        F.lit(True).alias("_in_t"))
    dele = (F.coalesce(F.col(delete_col), F.lit(False)) if delete_col
            else F.lit(False))
    s = source.select(
        *[F.col(c).alias(f"_s_{c}") for c in scols],
        dele.alias("_del"),
        F.lit(True).alias("_in_s"))
    cond = reduce(lambda a, b: a & b,
                  [t[f"_t_{k}"].eqNullSafe(s[f"_s_{k}"]) for k in keys])
    j = t.join(s, cond, "full_outer")
    matched = F.col("_in_t").isNotNull() & F.col("_in_s").isNotNull()
    src_only = F.col("_in_t").isNull()
    keep = F.when(matched, ~F.col("_del")) \
        .when(src_only, F.lit(insert) & ~F.col("_del")) \
        .otherwise(F.lit(True))

    def tacc(c: str):
        return F.col(f"_t_{c}")

    def sacc(c: str):
        return F.col(f"_s_{c}") if c in scols else F.lit(None)

    def out(c: str):
        tval, sval = tacc(c), sacc(c)
        if c in keys:
            return F.coalesce(tval, sval).alias(c)
        if c in update_exprs:
            return (F.when(matched, update_exprs[c](tacc, sacc))
                    .when(src_only, sval).otherwise(tval).alias(c))
        if c in update_cols:
            return F.when(matched | src_only, sval).otherwise(tval).alias(c)
        return F.when(src_only, sval).otherwise(tval).alias(c)

    return j.where(keep).select(*[out(c) for c in tcols])


def cdc_diff(old: DataFrame, new: DataFrame, keys: Sequence[str],
             compare_cols: Optional[Sequence[str]] = None,
             with_before: bool = False) -> DataFrame:
    """The change stream that transforms ``old`` into ``new`` —
    (op, <new's columns>) with op in insert / update / delete:
    MERGE's dual (CDC *generation* instead of CDC *apply*). Row values
    come from ``new`` for insert/update and from ``old`` for delete
    (the tombstone carries the last-known row, Debezium-style).
    Unchanged rows emit nothing; change detection over
    ``compare_cols`` (default: all shared non-key columns) is
    null-safe, so NULL -> value is an update and NULL -> NULL is not.

    Round-trip law (pinned in tests):
    ``merge_into(old, cdc_diff(old, new), delete_col=...)`` == new.

    ``with_before=True`` additionally emits Debezium-style
    before-image columns ``_b_<col>`` (the OLD value; NULL on
    inserts) for every shared column — what downstream incremental
    aggregate maintenance needs to retract an update's old
    contribution (see ``incremental_rollup``).
    Scale shape: one full-outer join on the keys, presence flags +
    per-column CASE — identical to merge_into's plan. Pair with
    ``EventStore`` time travel to generate the feed between any two
    committed versions."""
    ncols = list(new.columns)
    if compare_cols is None:
        compare_cols = [c for c in ncols
                        if c in old.columns and c not in keys]
    o = old.select(*[F.col(c).alias(f"_o_{c}") for c in old.columns],
                   F.lit(True).alias("_in_o"))
    n = new.select(*[F.col(c).alias(f"_n_{c}") for c in ncols],
                   F.lit(True).alias("_in_n"))
    cond = reduce(lambda a, b: a & b,
                  [o[f"_o_{k}"].eqNullSafe(n[f"_n_{k}"]) for k in keys])
    j = o.join(n, cond, "full_outer")
    ins = F.col("_in_o").isNull()
    dele = F.col("_in_n").isNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    op = (F.when(ins, F.lit("insert"))
          .when(dele, F.lit("delete"))
          .when(changed, F.lit("update")))

    def val(c: str):
        oval = F.col(f"_o_{c}") if c in old.columns else F.lit(None)
        return F.when(dele, oval).otherwise(F.col(f"_n_{c}")).alias(c)

    cols = [val(c) for c in ncols]
    if with_before:
        cols += [F.when(ins, F.lit(None)).otherwise(F.col(f"_o_{c}"))
                 .alias(f"_b_{c}")
                 for c in ncols if c in old.columns]
    return (j.select(op.alias("op"), *cols)
            .where(F.col("op").isNotNull()))


def incremental_rollup(rollup: DataFrame, changes: DataFrame,
                       group_cols: Sequence[str], val_col: str,
                       n_col: str = "n_rows",
                       sum_col: str = "sum_val") -> DataFrame:
    """Incremental view maintenance for an additive rollup: apply a
    CDC batch (``cdc_diff(..., with_before=True)`` output) to a
    ``(group_cols..., n_col, sum_col)`` aggregate WITHOUT rescanning
    the fact table — the materialized-rollup refresh move at 100 TB,
    where the delta is megabytes and the facts are not.

    Every change decomposes into retract + apply: updates and
    deletes retract ``(-1, -before_value)`` at the BEFORE group
    (so a row that moves groups leaves the old one), inserts and
    updates apply ``(+1, +value)`` at the current group. Deltas
    aggregate per group (delta-sized shuffle), then one group-keyed
    outer join onto the rollup; groups whose count reaches zero drop.

    Exactness contract: with an integer (or integer-quantized) value
    column, incremental == full recompute BIT-FOR-BIT in any
    engine/partitioning (the oracle for the registered query proves
    exactly that). Float value columns maintain correctly up to float
    associativity — quantize upstream if you need the audit to hash."""
    rem = (changes.where(F.col("op").isin("update", "delete"))
           .select(*[F.col(f"_b_{c}").alias(c) for c in group_cols],
                   F.lit(-1).alias("_dn"),
                   (-F.col(f"_b_{val_col}")).alias("_dv")))
    add = (changes.where(F.col("op").isin("insert", "update"))
           .select(*group_cols,
                   F.lit(1).alias("_dn"),
                   F.col(val_col).alias("_dv")))
    deltas = (rem.unionByName(add)
              .groupBy(*group_cols)
              .agg(F.sum("_dn").alias("_dn"), F.sum("_dv").alias("_dv")))
    # NULL group keys are legal rollup groups: a name-list (USING)
    # full-outer join would leave a NULL key in the rollup unmatched
    # against the same NULL key in the deltas, splitting one group
    # into two output rows and breaking the bit-for-bit contract
    # above. cdc_diff already keys with eqNullSafe; mirror it here and
    # coalesce the two key sides back into one output column.
    r = rollup.alias("_r")
    d = deltas.alias("_d")
    cond = None
    for c in group_cols:
        e = F.col(f"_r.{c}").eqNullSafe(F.col(f"_d.{c}"))
        cond = e if cond is None else (cond & e)
    j = r.join(d, cond, "full_outer")
    key_out = [F.coalesce(F.col(f"_r.{c}"), F.col(f"_d.{c}")).alias(c)
               for c in group_cols]
    zero_sum = F.lit(0).cast(rollup.schema[sum_col].dataType)
    return (j.select(*key_out,
                     (F.coalesce(F.col(n_col), F.lit(0))
                      + F.coalesce(F.col("_dn"), F.lit(0)))
                     .alias(n_col),
                     (F.coalesce(F.col(sum_col), zero_sum)
                      + F.coalesce(F.col("_dv"), zero_sum))
                     .alias(sum_col))
            .where(F.col(n_col) > 0))
