"""End-to-end example: experiment / metric-integrity readout.

The statistics walkthrough (operators/stats.py + profile.corr_matrix
+ temporal.acf): the questions an experimentation platform asks of
the same events table, each ONE aggregation pass over the fact scan:

  1. location test     is any event type's value shifted vs the
                       'view' baseline (stats.welch_ttest), and do
                       ALL types differ jointly (stats.anova_oneway)?
  2. rate test         does purchase conversion differ by weekday
                       (stats.two_proportion_ztest)?
  3. shape test        does the purchase-value DISTRIBUTION differ
                       from views, beyond its mean (stats.ks_test)?
  4. independence      is event type associated with weekday
                       (stats.chi_square_independence)?
  5. integrity         does the metric column obey Benford's law
                       (stats.benford_first_digit), and which metric
                       pairs co-move (profile.corr_matrix)?
  6. periodicity       which seasonal period should a forecaster
                       model (temporal.acf over the hourly series)?

Every statistic is algebraic (count/sum/sum-of-squares class): the
group moments collapse map-side, the finishing joins are against
category-sized broadcasts — at 100 TB the fact scan is the entire
cost, and all six readouts could share one cached scan.

Run:  python examples/experiment_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import stats, temporal
from recdb_postgresql_spark.operators.profile import corr_matrix

SF_DIR = "/root/testdata/sf0.001"
DAY_NS = 86400 * 10 ** 9


def run(spark, sf_dir: str = SF_DIR, verbose: bool = True):
    from recdb_postgresql_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    dow = ((F.expr(f"ts div {DAY_NS}") + 4) % 7).cast("int")
    out = {}

    welch = stats.welch_ttest(ev, "event_type", "value", "view")
    out["welch"] = {r["event_type"]: r["t_stat"] for r in welch.collect()}

    anova = stats.anova_oneway(ev, "event_type", "value").collect()[0]
    out["anova_f"] = anova["f_stat"]

    zt = stats.two_proportion_ztest(
        ev.withColumn("dow", dow), "dow",
        F.col("event_type") == "purchase", baseline=0)
    out["conversion_z"] = {r["dow"]: r["z_stat"] for r in zt.collect()}

    ks = stats.ks_test(ev, "event_type", "value",
                       "purchase", "view").collect()[0]
    out["ks_d"] = ks["d_stat"]

    chi = stats.chi_square_independence(
        ev.withColumn("dow", dow), "event_type", "dow").collect()[0]
    out["chi2"] = chi["chi2"]
    out["cramers_v"] = chi["cramers_v"]

    ben = stats.benford_first_digit(ev, "value")
    out["benford_chi2"] = ben.agg(F.sum("chi2_term")).collect()[0][0]

    corr = corr_matrix(ev.select("value",
                                 (F.col("value") * 2).alias("double_v"),
                                 F.col("user_id").cast("double")
                                 .alias("uid")),
                       ["value", "double_v", "uid"])
    out["corr_value_double"] = [
        r["corr"] for r in corr.collect()
        if (r["col_a"], r["col_b"]) == ("value", "double_v")][0]

    acf = temporal.acf(ev, lags=6)
    out["acf_lag1"] = {r["lag"]: r["acf"] for r in acf.collect()}[1]

    if verbose:
        print("welch t per type:", out["welch"])
        print("anova F:", out["anova_f"])
        print("conversion z by dow:", out["conversion_z"])
        print("KS purchase-vs-view D:", out["ks_d"])
        print("chi2 type x dow:", out["chi2"], "V:", out["cramers_v"])
        print("benford chi2:", out["benford_chi2"])
        print("corr(value, 2*value):", out["corr_value_double"])
        print("hourly acf lag 1:", out["acf_lag1"])
    return out


if __name__ == "__main__":
    from recdb_postgresql_spark.engine import get_spark

    spark = get_spark("experiment_example")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark)
