"""End-to-end example: product analytics over an event stream.

The fifth walkthrough: the event-sequence surface
(operators/funnel.py + temporal.moving_aggregate) — the
Amplitude/Mixpanel-style questions a product team asks of the same
events table the recommender trains on:

  1. ordered funnel          how many users signed up, then viewed,
                             then clicked, then purchased — strictly
                             in that order (funnel.funnel_counts,
                             one-pass sorted fold; the multipass twin
                             is the skew-safe production path)
  2. last-touch attribution  which touchpoint closed each purchase
                             (funnel.last_touch_attribution — one
                             carry-forward window)
  3. cohort retention        of each week's new users, how many came
                             back k weeks later
                             (funnel.cohort_retention)
  4. trailing engagement     each event's 1h trailing value stats
                             (temporal.moving_aggregate — time RANGE
                             window, tie-stable)

Run:  python examples/analytics_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import funnel, temporal

SF_DIR = "/root/testdata/sf0.001"
STEPS = ["signup", "view", "click", "purchase"]
WEEK_NS = 7 * 86400 * 10 ** 9


def run(spark, sf_dir: str = SF_DIR, verbose: bool = True):
    from recdb_postgresql_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    out = {}

    steps = funnel.funnel_counts(ev, STEPS).orderBy("step_idx").collect()
    out["funnel"] = [(r["step"], r["n_users"]) for r in steps]

    att = funnel.last_touch_attribution(ev, "purchase")
    out["attribution_mix"] = {
        r["attributed_type"]: r["n"]
        for r in att.groupBy("attributed_type")
        .agg(F.count(F.lit(1)).alias("n")).collect()}

    ret = funnel.cohort_retention(ev, WEEK_NS)
    out["cohort_cells"] = ret.count()
    out["week0_users"] = (ret.where(F.col("period_offset") == 0)
                          .agg(F.sum("n_users")).collect()[0][0])

    mov = temporal.moving_aggregate(ev, window_ns=3600 * 10 ** 9)
    out["max_hourly_n"] = mov.agg(F.max("win_n")).collect()[0][0]

    if verbose:
        print("funnel:", out["funnel"])
        print("attribution mix:", out["attribution_mix"])
        print("cohort cells:", out["cohort_cells"],
              "week-0 users:", out["week0_users"])
        print("busiest trailing hour:", out["max_hourly_n"], "events")
    return out


if __name__ == "__main__":
    from recdb_postgresql_spark.engine import get_spark

    spark = get_spark("analytics_example")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark)
