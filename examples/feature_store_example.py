"""End-to-end example: temporal feature engineering over an event
stream, Spark-first.

The third walkthrough next to the MovieLens recommender and the
corpus-cleaning pipeline: the TEMPORAL surface — the operators a
feature store / label factory needs and vanilla SQL joins express
badly (operators/temporal.py). A deterministic synthetic click +
purchase stream runs the whole family:

  1. as-of join              latest click state at each purchase
                             (temporal.asof_join — union+window, no
                             range join)
  2. leakage-safe features   strict=True + staleness tolerance: a
                             label's own instant can never leak into
                             its features, stale state nulls out
  3. interval attribution    ALL clicks inside each purchase's
                             lookback window (temporal.interval_join —
                             1-D grid cells, no |P|x|C| blowup)
  4. feature grid            per-user regular time grid with
                             forward-filled state
                             (temporal.resample_ffill — generated
                             spine, gap rows never shuffle)
  5. skew-bounded variant    the same as-of answer through
                             asof_join_bucketed (hot-key sort capped
                             at one time bucket per task)

Run:  python examples/feature_store_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import temporal

HOUR = 3_600


def synthesize_stream(spark):
    """A deterministic two-table stream in integer seconds: every user
    clicks on a fixed cadence, purchases land between clicks (and one
    exactly AT a click instant — the strict-mode showcase)."""
    clicks = spark.createDataFrame(
        # user 4 goes quiet after two clicks — their later purchases
        # only have STALE click state (the tolerance showcase)
        [(100 * u + i, u, u * 7 + i * 1800, float(u + i))
         for u in range(1, 5) for i in range(8 if u < 4 else 2)],
        "click_id long, user_id long, ts long, click_value double")
    purchases = spark.createDataFrame(
        # mid-gap purchases + one same-instant purchase for user 1
        [(9000 + u * 10 + j, u, u * 7 + j * 3600 + 900, 10.0 * j)
         for u in range(1, 5) for j in range(3)]
        + [(9999, 1, 1 * 7 + 2 * 1800, 99.0)],
        "purchase_id long, user_id long, ts long, amount double")
    return clicks, purchases


def run(spark, verbose: bool = True):
    clicks, purchases = synthesize_stream(spark)
    out = {}

    # 1. as-of: the most recent click value at or before each purchase
    feats = temporal.asof_join(purchases, clicks, on="user_id",
                               value_cols=("click_value",),
                               right_tiebreak="click_id")
    fv = {r.purchase_id: (r.click_value, r.matched_ts)
          for r in feats.collect()}
    out["asof_rows"] = len(fv)
    out["asof_matched"] = sum(1 for v, _ in fv.values() if v is not None)

    # 2. leakage-safe: strictly-before only, and clicks older than an
    # hour are too stale to use
    safe = temporal.asof_join(purchases, clicks, on="user_id",
                              value_cols=("click_value",), strict=True,
                              tolerance=HOUR, right_tiebreak="click_id")
    out["strict_matched"] = safe.where(F.col("click_value").isNotNull()).count()
    # the same-instant click is visible non-strict, invisible strict
    same_instant = 9999
    sv = {r.purchase_id: r.click_value for r in safe.collect()}
    assert fv[same_instant][0] is not None
    out["same_instant_leak_blocked"] = (sv[same_instant]
                                        != fv[same_instant][0])

    # 3. interval attribution: every click inside each purchase's
    # 1-hour lookback, aggregated per purchase
    windows = purchases.select(
        "user_id", "purchase_id",
        (F.col("ts") - HOUR).alias("start_ts"), F.col("ts").alias("end_ts"))
    attributed = (temporal.interval_join(
        clicks.select("user_id", "ts", "click_value"), windows,
        on="user_id", cell=HOUR)
        .groupBy("purchase_id")
        .agg(F.count("*").alias("n_clicks"),
             F.sum("click_value").alias("click_total")))
    out["windows_with_clicks"] = attributed.count()

    # 4. per-user 15-minute feature grid — finer than the click
    # cadence, so gap buckets appear and get the carried state
    grid = temporal.resample_ffill(
        clicks.select("user_id", "ts", "click_id",
                      F.col("click_value").alias("value")),
        on="user_id", bucket=900, tiebreak="click_id")
    out["grid_rows"] = grid.count()
    out["grid_gap_rows_filled"] = grid.where(
        (F.col("n_events") == 0) & F.col("value").isNotNull()).count()

    # 5. the skew-bounded variant returns the identical as-of answer
    bucketed = temporal.asof_join_bucketed(
        purchases, clicks, on="user_id", time_bucket=2 * HOUR,
        value_cols=("click_value",), right_tiebreak="click_id")
    bv = {r.purchase_id: (r.click_value, r.matched_ts)
          for r in bucketed.collect()}
    out["bucketed_identical"] = (bv == fv)

    if verbose:
        for k, v in out.items():
            print(f"{k:28s} {v}")
    return out


def main():
    from recdb_postgresql_spark.engine import get_spark

    spark = get_spark("feature_store_example", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    run(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
