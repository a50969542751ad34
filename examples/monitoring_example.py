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
  6. PSI score                      (profile.psi_drift — the one
                                     scalar a pager thresholds)
  7. change-point scan              (temporal.changepoint_scores on
                                     the RESIDUALS — raw-series shifts
                                     would flag the daily ramp itself)
  8. one-step-ahead forecast        (temporal.holt_forecast — the
                                     backtest column for alert rules)
  9. streaming drift monitor        (StreamingDriftMonitor — the same
                                     PSI, frozen baseline, per batch)

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

    # 6. PSI between the same halves: one scalar the on-call pager
    # can threshold (0.1 watch / 0.25 action) — the trend makes the
    # second half's distribution visibly shift
    psi_rows = profile.psi_drift(
        ev.where(F.expr(f"ts div {HOUR_NS}") < half).select("value"),
        ev.where(F.expr(f"ts div {HOUR_NS}") >= half).select("value"),
        bins=10).collect()
    out["psi_total"] = round(sum(r["psi_term"] for r in psi_rows), 6)

    # 7. change-point scan — on the RESIDUALS, not the raw series:
    # the diurnal ramp is a legitimate level move every morning, so
    # raw-series shift scores flag the cycle; after decomposition the
    # residual series is flat except the incidents, and the top shift
    # scores land adjacent to them
    cp = temporal.changepoint_scores(dec, ["event_type"],
                                     "bucket", "residual", window=6)
    top_cp = (cp.where(F.col("shift_score").isNotNull())
              .orderBy(F.col("shift_score").desc()).limit(6).collect())
    incident_buckets = {5 * 24 + 3, 11 * 24 + 14, 17 * 24 + 22}
    out["changepoints_near_incidents"] = all(
        any(abs(r["bucket"] % (21 * 24) - ib) <= 6
            for ib in incident_buckets)
        for r in top_cp)

    # 8. one-step-ahead forecast (Holt): the backtest column an
    # alerting rule compares against tomorrow's actuals
    hf = temporal.holt_forecast(hourly, ["event_type"], "bucket", "y")
    resid = hf.select(F.abs(F.col("y") - F.col("yhat")).alias("e"))
    out["holt_mae"] = round(resid.agg(F.avg("e")).collect()[0][0], 2)

    # 9. the STREAMING face: freeze the first half as baseline, score
    # the second half as a batch — alerts before the retrain ingests it
    from recdb_postgresql_spark.streaming.ingest import (
        StreamingDriftMonitor,
    )
    mon = StreamingDriftMonitor(
        spark, ev.where(F.expr(f"ts div {HOUR_NS}") < half)
        .select("value"))
    verdict = mon.on_batch(
        ev.where(F.expr(f"ts div {HOUR_NS}") >= half).select("value"),
        batch_id=0)
    out["stream_alert"] = bool(verdict["alert"])
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
