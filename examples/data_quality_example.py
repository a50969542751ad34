"""End-to-end example: the data-quality gate a table passes before a
downstream team (or a 100 TB training pipeline) consumes it.

Seven audits, each one-or-two aggregation passes, composing the
profile / privacy / stats / dml operators:

  1. contracts     row-level expectations as conditional sums in ONE
                   pass (profile.validate)
  2. referential   FK orphan rates per edge (anti-join per edge;
                   see audit_fk_integrity for the full sweep)
  3. dependencies  do assumed functional dependencies actually hold,
                   and how badly not — g3 error (profile.fd_audit)
  4. outliers      robust per-group modified z-scores that a few bad
                   rows cannot mask (stats.mad_outliers)
  5. privacy       k-anonymity class sizes AND distribution skew
                   (privacy.k_anonymity_audit + t_closeness_audit —
                   cardinality alone misses the skew leak)
  6. drift-free    refresh: the per-type rollup maintained from a CDC
                   delta equals the full recompute
                   (dml.cdc_diff(with_before) + incremental_rollup)
  7. fingerprint   one bucketed XOR fingerprint for cross-system
                   reconciliation (profile.table_fingerprint)

At 100 TB: audits 1/3/4/5 are one fact scan each (shareable via one
cached scan); audit 2 is key-join-sized; audit 6 never rescans facts
(delta-sized); audit 7 is one scan collapsing to n_buckets rows.

Run:  python examples/data_quality_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import dml, privacy, stats
from recdb_postgresql_spark.operators.profile import (
    fd_audit, table_fingerprint, validate)

SF_DIR = "/root/testdata/sf0.001"
DAY_NS = 86400 * 10 ** 9


def run(spark, sf_dir: str = SF_DIR, verbose: bool = True):
    from recdb_postgresql_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    out = {}

    # 1. row-level contracts, one pass
    rules = [("value_negative", F.col("value") < 0),
             ("type_unknown", ~F.col("event_type").isin(
                 "view", "click", "purchase", "signup", "error")),
             ("user_missing", F.col("user_id").isNull())]
    v = validate(ev, rules)
    out["contracts"] = {r["rule"]: r["violations"]
                        for r in v.collect()}

    # 2. referential integrity on one edge
    orphans = (orders.join(customer,
                           orders["o_custkey"] == customer["c_custkey"],
                           "left_anti").count())
    out["fk_orphans"] = orphans

    # 3. functional dependencies (one that holds, one that can't)
    fds = fd_audit(orders, [
        ("orderkey->status", ["o_orderkey"], "o_orderstatus"),
        ("custkey->priority", ["o_custkey"], "o_orderpriority")])
    out["fd"] = {r["fd"]: (r["holds"], r["g3_rows"])
                 for r in fds.collect()}

    # 4. robust outliers per priority class
    mz = stats.mad_outliers(orders, "o_orderpriority", "o_totalprice",
                            "o_orderkey")
    out["n_outliers"] = mz.where(F.abs(F.col("mz")) > 3.5).count()

    # 5. privacy: class sizes + distribution skew
    quasi = ev.withColumn(
        "dow", ((F.expr(f"ts div {DAY_NS}") + 4) % 7).cast("int"))
    kan = privacy.k_anonymity_audit(quasi, ["event_type", "dow"], k=5)
    out["kanon_violations"] = kan.where("violates").count()
    tcl = privacy.t_closeness_audit(quasi, ["event_type", "dow"],
                                    "value", t=0.2, bins=10)
    out["tclose_violations"] = tcl.where("violates").count()

    # 6. incremental refresh == recompute
    base = ev.where(F.col("event_id") % 7 != 0) \
        .select("event_id", "event_type",
                F.round(F.col("value") * 1e6, 0).cast("long").alias("q"))
    new = ev.select("event_id", "event_type",
                    F.round(F.col("value") * 1e6, 0).cast("long")
                    .alias("q"))
    rollup0 = (base.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("q").alias("sum_val")))
    changes = dml.cdc_diff(base, new, ["event_id"], with_before=True)
    r1 = dml.incremental_rollup(rollup0, changes, ["event_type"], "q")
    full = (new.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("q").alias("sum_val")))
    out["ivm_matches_recompute"] = (
        sorted(map(tuple, r1.collect())) ==
        sorted(map(tuple, full.collect())))

    # 7. reconciliation fingerprint
    fp = table_fingerprint(
        orders.select("o_orderkey", "o_totalprice"),
        F.col("o_orderkey"), ["o_orderkey", "o_totalprice"])
    out["fingerprint_buckets"] = fp.count()

    if verbose:
        for k, val in out.items():
            print(f"{k}: {val}")
    return out


if __name__ == "__main__":
    from recdb_postgresql_spark.engine import get_spark

    s = get_spark("data_quality_example", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    run(s)
