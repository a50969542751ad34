"""End-to-end example: feature engineering -> scorer evaluation ->
sequential decision — the model-adjacent lifecycle around a tabular
scorer, built entirely from the round-9 operator batch:

  1. features      leakage-free LOO target encoding of the customer's
                   nation against order value (functions/encoding.
                   target_encode_loo) — the one-window closed-form
                   K-fold, plus quantile normalization of event
                   values across types (same module).
  2. score eval    rank users by an activity score against the
                   heavy-buyer label, then read the scorer three
                   ways: RANKING quality (stats.auc_rank),
                   PROBABILITY quality (stats.calibration_table +
                   Brier), and TARGETING yield (stats.gains_table).
  3. causal eval   the same decile machinery on a hash-split A/B:
                   Qini uplift (stats.qini_table) — flat tails mean
                   the score targets sure-things, not persuadables.
  4. decision      monitor the treated arm's conversion with Wald's
                   SPRT (stats.sprt_monitor) and stop the moment the
                   evidence crosses the boundary, not at a preplanned
                   horizon.

Every stage is one-or-two aggregation passes; the only global-order
windows run over SCORED/deciled rollups (pre-bin at corpus scale —
the documented quantile_normalize/gains swap).

Run:  python examples/targeting_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from recdb_postgresql_spark.functions.encoding import target_encode_loo
from recdb_postgresql_spark.functions.sampling import hash_bucket
from recdb_postgresql_spark.operators import stats

SF_DIR = "/root/testdata/sf0.001"


def run(spark, sf_dir: str = SF_DIR, verbose: bool = True):
    from recdb_postgresql_spark.sources.readers import load_table

    out = {}

    # 1. leakage-free categorical feature
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    base = (orders.join(F.broadcast(cust.select("c_custkey",
                                                "c_nationkey")),
                        orders["o_custkey"] == cust["c_custkey"])
            .select("o_orderkey", "c_nationkey",
                    F.round(F.col("o_totalprice") * 100, 0)
                    .cast("long").alias("cents")))
    enc = target_encode_loo(base, ["c_nationkey"], "cents",
                            smoothing_m=20.0)
    out["n_encoded"] = enc.count()
    out["distinct_loo"] = enc.select("te_loo").distinct().count()

    # 2. scorer eval trio: does ACTIVITY predict HEAVY BUYING?
    # score = 1 - 0.99^n_events (monotone in activity, in [0, 1] so
    # the calibration bins read as probabilities); label = the user's
    # purchase count is above the global average — a label that
    # splits users at every SF (purchased-at-least-once saturates on
    # heavy-traffic synthetic users).
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("user_id").isNotNull()))
    users = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum((F.col("event_type") == "purchase")
                        .cast("long")).alias("n_purchases"))
             .withColumn("treated",
                         hash_bucket(F.concat(
                             F.lit("ab:"),
                             F.col("user_id").cast("string")))
                         < 500_000))
    avg_p = users.agg(F.avg("n_purchases")).collect()[0][0]
    users = users.withColumn("purchased",
                             (F.col("n_purchases") > avg_p)
                             .cast("long"))
    scored = users.select(
        F.col("user_id").alias("uid"),
        (1 - F.pow(F.lit(0.99), F.col("n_events"))).alias("sc"),
        (F.col("purchased") == 1).alias("y"))
    out["auc"] = stats.auc_rank(scored, "sc", F.col("y")) \
        .collect()[0]["auc"]
    cal = stats.calibration_table(scored, "sc", F.col("y")).collect()
    out["brier"] = round(sum(r["brier_term"] for r in cal), 6)
    gains = stats.gains_table(scored, "sc", F.col("y"), "uid")
    out["top_decile_lift"] = gains.collect()[0]["lift"]

    # 3. Qini uplift on a hash-split A/B over the same users
    qini = stats.qini_table(users, "n_events", F.col("treated"),
                            F.col("purchased") == 1, "user_id")
    out["qini_final"] = qini.collect()[-1]["qini"]

    # 4. sequential stop on the treated conversion stream
    treated_ev = users.where("treated").join(ev, "user_id")
    sprt = stats.sprt_monitor(
        treated_ev, F.expr(f"ts div {21600 * 10 ** 9}"),
        F.col("event_type") == "purchase", p0=0.15, p1=0.25)
    rows = sprt.collect()
    out["sprt_final"] = rows[-1]["decision"]
    out["sprt_peeks"] = len(rows)

    if verbose:
        for k, v in out.items():
            print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    from recdb_postgresql_spark.engine import get_spark

    spark = get_spark("targeting_example")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark)
