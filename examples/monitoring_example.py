"""End-to-end example: robust production monitoring over an event
stream — the round-8 statistical surface chained the way an
on-call pipeline actually runs it.

  1. daily rollup                   (aggregate FIRST — every fit
                                     below costs #buckets, not events)
  2. robust per-type trend          (regression.theil_sen_grouped —
                                     outlier days can't bend the fit)
  3. seasonal decomposition         (temporal.seasonal_decompose —
                                     hourly trend/seasonal/residual)
  4. residual anomalies             (z-scores AGAINST the pattern,
                                     so the daily peak isn't "anomalous")
  5. distribution drift             (profile.profile_drift between
                                     the first and second half)

The planted story: a steady upward trend + a strong hour-of-day
cycle + three injected incident hours. Raw-value thresholds would
flag every cycle peak; the residual detector flags exactly the
incidents.

Run:  python examples/monitoring_example.py
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

HOUR_NS = 3600 * 10**9
DAY_NS = 24 * HOUR_NS


def synth_events(spark, days: int = 21):
    """Deterministic hourly event stream: value = trend + diurnal
    cycle + small deterministic jitter; three incident hours carry a
    5x spike. Two event types with different scales."""
    rows = []
    incidents = {(5, 3), (11, 14), (17, 22)}     # (day, hour)
    for day in range(days):
        for hour in range(24):
            ts = (day * 24 + hour) * HOUR_NS
            cycle = [4, 3, 2, 2, 2, 3, 5, 8, 11, 12, 12, 11,
                     10, 10, 11, 12, 13, 14, 13, 11, 9, 7, 6, 5][hour]
            jitter = ((day * 7 + hour * 13) % 5) - 2
            base = 100 + 2 * day + 10 * cycle + jitter
            if (day, hour) in incidents:
                base *= 5
            rows.append((day * 24 + hour, ts, 1, "api", float(base)))
            rows.append((days * 24 + day * 24 + hour, ts, 2, "batch",
                         float(0.5 * base)))
    return spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, "
              "event_type string, value double")


def run(spark) -> dict:
    from recdb_postgresql_spark.operators import profile, regression, temporal

    ev = synth_events(spark).localCheckpoint()
    out: dict = {}

    # 1+2. daily rollup -> robust per-type trend (the planted api
    # trend is 48/day before the cycle-mean offset; incidents are
    # outlier days Theil-Sen shrugs off)
    daily = (ev.groupBy("event_type",
                        F.expr(f"ts div {DAY_NS}").alias("day"))
             .agg(F.sum("value").alias("total")))
    trends = {r["event_type"]: r["slope"] for r in
              regression.theil_sen_grouped(
                  daily, ["event_type"], "day", "total").collect()}
    out["trend_api_per_day"] = trends["api"]
    out["trend_ratio_batch_api"] = round(
        trends["batch"] / trends["api"], 2)

    # 3. hourly decomposition (period 24)
    hourly = (ev.groupBy("event_type",
                         F.expr(f"ts div {HOUR_NS}").alias("bucket"))
              .agg(F.sum("value").alias("y")))
    dec = temporal.seasonal_decompose(hourly, ["event_type"],
                                      "bucket", "y", period=24) \
        .where(F.col("residual").isNotNull()).localCheckpoint()
    out["decomposed_rows"] = dec.count()

    # 4. residual anomalies: top hours by |residual| z-score
    sd = dec.groupBy("event_type").agg(
        F.stddev_samp("residual").alias("_sd"))
    top = (dec.join(sd, "event_type")
           .select("event_type", "bucket",
                   (F.abs(F.col("residual")) / F.col("_sd"))
                   .alias("abs_z"))
           .orderBy(F.col("abs_z").desc()).limit(6).collect())
    out["anomalous_hours"] = sorted(
        {(r["event_type"], r["bucket"] % (21 * 24) // 24,
          r["bucket"] % 24) for r in top})

    # 5. drift between halves (level shift from the trend shows up
    # as a mean/percentile drift in the profile diff)
    half = 10 * 24
    drift = profile.profile_drift(
        ev.where(F.expr(f"ts div {HOUR_NS}") < half).select("value"),
        ev.where(F.expr(f"ts div {HOUR_NS}") >= half).select("value"),
        ["value"])
    out["drift_metrics"] = drift.count()
    return out


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from recdb_postgresql_spark.engine import get_spark

    spark = get_spark("monitoring_example")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in run(spark).items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
