"""Ordered-funnel + cohort-retention semantics: the one-pass sorted
fold must match the strictly-after chain definition on hand-built
streams (oracle parity at corpus scale is in test_oracle_parity)."""

import os
import sys

from pyspark.sql import Row

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recdb_postgresql_spark.operators import funnel

STEPS = ["a", "b", "c"]


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, user_id=u, event_type=t, ts=ts)
         for i, (u, t, ts) in enumerate(rows)])


def _depths(spark, rows):
    d = funnel.funnel_user_depth(_ev(spark, rows), STEPS)
    return {r["user"]: r for r in d.collect()}


def test_funnel_simple_chain(spark):
    out = _depths(spark, [(1, "a", 10), (1, "b", 20), (1, "c", 30)])
    assert out[1]["depth"] == 3
    assert (out[1]["ts_1"], out[1]["ts_2"], out[1]["ts_3"]) == (10, 20, 30)


def test_funnel_out_of_order_does_not_count(spark):
    # b happens BEFORE a: b can't extend a chain that hasn't started,
    # and c (step 3) can't fire without step 2 — depth stops at 1
    out = _depths(spark, [(1, "b", 5), (1, "a", 10), (1, "c", 30)])
    assert out[1]["depth"] == 1
    assert out[1]["ts_2"] is None
    out2 = _depths(spark, [(1, "c", 1), (1, "b", 2), (1, "a", 3)])
    assert out2[1]["depth"] == 1


def test_funnel_strictly_after_not_equal(spark):
    # equal timestamps do not advance the chain
    out = _depths(spark, [(1, "a", 10), (1, "b", 10)])
    assert out[1]["depth"] == 1


def test_funnel_picks_earliest_legal_step(spark):
    # two b's after a: the EARLIER one is the chain ts, and c must be
    # after that earlier b
    out = _depths(spark, [(1, "a", 10), (1, "b", 40), (1, "b", 20),
                          (1, "c", 30)])
    assert out[1]["ts_2"] == 20
    assert out[1]["depth"] == 3          # c@30 > b@20


def test_funnel_skipping_middle_step_blocks_chain(spark):
    out = _depths(spark, [(1, "a", 10), (1, "c", 30)])
    assert out[1]["depth"] == 1
    assert out[1]["ts_3"] is None


def test_funnel_counts_zero_row_for_unreached_step(spark):
    c = funnel.funnel_counts(_ev(spark, [(1, "a", 10), (2, "a", 5),
                                         (2, "b", 6)]), STEPS)
    rows = {r["step"]: r["n_users"] for r in c.collect()}
    assert rows == {"a": 2, "b": 1, "c": 0}


def test_cohort_retention_triangle(spark):
    # period 10: u1 first at p0, active p0 and p2; u2 first at p1
    ev = _ev(spark, [(1, "a", 5), (1, "a", 7), (1, "a", 25),
                     (2, "a", 15)])
    out = {(r["cohort_period"], r["period_offset"]): r["n_users"]
           for r in funnel.cohort_retention(ev, period_ns=10).collect()}
    assert out == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_last_touch_attribution(spark):
    rows = [(1, "view", 10), (1, "purchase", 20), (1, "click", 30),
            (1, "purchase", 40), (2, "purchase", 5)]
    out = {r["conversion_id"]: r for r in
           funnel.last_touch_attribution(_ev(spark, rows), "purchase")
           .collect()}
    # event ids are enumeration order: purchase@20 -> id 1, @40 -> 3, @5 -> 4
    assert out[1]["attributed_type"] == "view" and out[1]["attributed_ts"] == 10
    assert out[3]["attributed_type"] == "click" and out[3]["attributed_ts"] == 30
    assert out[4]["attributed_type"] is None     # no prior touch: kept, null


def test_attribution_skips_prior_conversions(spark):
    # the touch before the 2nd purchase is the 1st purchase -> must
    # look PAST it to the last non-conversion event
    rows = [(1, "view", 10), (1, "purchase", 20), (1, "purchase", 30)]
    out = {r["conversion_id"]: r for r in
           funnel.last_touch_attribution(_ev(spark, rows), "purchase")
           .collect()}
    assert out[2]["attributed_type"] == "view"


def test_moving_aggregate_range_window(spark):
    from recdb_postgresql_spark.operators import temporal

    ev = spark.createDataFrame(
        [Row(event_id=i, user_id=1, ts=t, value=v)
         for i, (t, v) in enumerate([(0, 1.0), (50, 2.0), (120, 4.0)])])
    out = {r["event_id"]: r for r in
           temporal.moving_aggregate(ev, window_ns=100).collect()}
    assert out[0]["win_n"] == 1 and out[0]["win_avg"] == 1.0
    assert out[1]["win_n"] == 2 and out[1]["win_sum"] == 3.0
    # at t=120 the window [20,120] excludes t=0
    assert out[2]["win_n"] == 2 and out[2]["win_sum"] == 6.0


def test_moving_aggregate_ties_share_window(spark):
    from recdb_postgresql_spark.operators import temporal

    ev = spark.createDataFrame(
        [Row(event_id=i, user_id=1, ts=10, value=float(i + 1))
         for i in range(3)])
    out = temporal.moving_aggregate(ev, window_ns=5).collect()
    assert {r["win_n"] for r in out} == {3}   # RANGE: ties see all peers
    assert {r["win_sum"] for r in out} == {6.0}


def test_funnel_multipass_matches_fold_on_corpus(spark):
    from recdb_postgresql_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    steps = ["signup", "view", "click", "purchase"]
    fold = {r["user"]: tuple(r) for r in
            funnel.funnel_user_depth(ev, steps).collect()}
    multi = {r["user"]: tuple(r) for r in
             funnel.funnel_user_depth_multipass(ev, steps).collect()}
    assert fold == multi


def test_funnel_multipass_matches_fold_on_edge_streams(spark):
    for rows in (
        [(1, "b", 5), (1, "a", 10), (1, "c", 30)],
        [(1, "a", 10), (1, "b", 10)],
        [(1, "a", 10), (1, "b", 40), (1, "b", 20), (1, "c", 30)],
        [(1, "a", 10), (2, "b", 5)],
    ):
        ev = _ev(spark, rows)
        fold = sorted(tuple(r) for r in
                      funnel.funnel_user_depth(ev, STEPS).collect())
        multi = sorted(tuple(r) for r in
                       funnel.funnel_user_depth_multipass(ev, STEPS).collect())
        assert fold == multi, rows


def test_kaplan_meier_hand_computed(spark):
    """Textbook KM: 5 users, W=5 (day_ns=1 so timestamps ARE days).
    tmax=20; u1 churns at t=10, u3 at t=3; u2/u4/u9 censored.
    S: 1.0 -> x(1-1/4)=0.75 -> x(1-1/3)=0.5 -> x(1-0/2)=0.5."""
    from recdb_postgresql_spark.operators import funnel

    rows = [(1, 0), (1, 10),
            (2, 0), (2, 18),
            (3, 5), (3, 8),
            (4, 0), (4, 16),
            (9, 20)]
    ev = spark.createDataFrame(rows, "user_id long, ts long")
    got = [(r["t_days"], r["n_risk"], r["n_churned"], r["survival"])
           for r in funnel.kaplan_meier(ev, churn_window_ns=5,
                                        day_ns=1).collect()]
    assert got == [(0, 5, 0, 1.0), (3, 4, 1, 0.75),
                   (10, 3, 1, 0.5), (20, 2, 0, 0.5)]


def test_kaplan_meier_censoring_matters(spark):
    """Counting censored users as churned (the naive estimator) would
    put S(final) at 0; KM keeps survival mass for them."""
    from recdb_postgresql_spark.operators import funnel

    rows = [(1, 0), (1, 2), (2, 0), (2, 99), (3, 0), (3, 99)]
    ev = spark.createDataFrame(rows, "user_id long, ts long")
    out = {r["t_days"]: r["survival"]
           for r in funnel.kaplan_meier(ev, churn_window_ns=10,
                                        day_ns=1).collect()}
    assert out[2] == round(1 - 1 / 3, 6)
    assert out[99] == round(1 - 1 / 3, 6)  # censored tail holds


def test_multi_touch_attribution_hand_computed(spark):
    """One user, ts in seconds (half_life=2, window=10): touches
    a@0, b@2, conversion@4 -> w_a = 2^(-2) = .25, w_b = 2^(-1) = .5;
    credit a = 1/3, b = 2/3. A second conversion@5 sees a (w=2^-2.5)
    and b (w=2^-1.5): same 1/3-2/3 split (ratio depends only on the
    gap BETWEEN touches). Same-instant touch@5 excluded (strict)."""
    from recdb_postgresql_spark.operators import funnel

    rows = [(1, "a", 0, 10), (1, "b", 2, 11), (1, "purchase", 4, 12),
            (1, "purchase", 5, 13), (1, "c", 5, 14)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long")
    got = {r["channel"]: r for r in funnel.multi_touch_attribution(
        ev, "purchase", half_life_ns=2, window_ns=10).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["n_touches"] == 2 and got["a"]["n_conversions"] == 2
    assert abs(got["a"]["total_credit"] - 2 / 3) < 1e-6
    assert abs(got["b"]["total_credit"] - 4 / 3) < 1e-6
    # every conversion hands out exactly one unit in total
    assert abs(got["a"]["total_credit"] + got["b"]["total_credit"]
               - 2.0) < 1e-6


def test_multi_touch_window_excludes_stale(spark):
    from recdb_postgresql_spark.operators import funnel

    rows = [(1, "a", 0, 1), (1, "purchase", 100, 2)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long")
    out = funnel.multi_touch_attribution(ev, "purchase",
                                         half_life_ns=2,
                                         window_ns=10).collect()
    assert out == []  # the only touch is outside the lookback


def test_cohort_ltv_planted(spark):
    """Two cohorts (periods 0 and 1, day_ns=1 so ts ARE periods),
    dense ages including a zero-revenue age, per-member
    normalization. u1,u2 join at p0; u3 at p1. Revenue:
    p0: u1=10; p1: u3=30; p2: u1=20.
    Cohort0 (size 2): ages 0,1,2 -> rev 10,0,20 -> cum/user 5,5,15.
    Cohort1 (size 1): ages 0,1 -> rev 30,0 -> cum/user 30,30."""
    from recdb_postgresql_spark.operators import funnel

    rows = [(1, 0, 10.0), (2, 0, 0.0), (3, 1, 30.0), (1, 2, 20.0)]
    ev = spark.createDataFrame(rows, "user_id long, ts long, value double")
    got = {(r["cohort"], r["age"]):
           (r["cohort_size"], r["period_revenue"],
            r["cum_revenue_per_user"])
           for r in funnel.cohort_ltv(ev, period_ns=1).collect()}
    assert got == {
        (0, 0): (2, 10.0, 5.0), (0, 1): (2, 0.0, 5.0),
        (0, 2): (2, 20.0, 15.0),
        (1, 0): (1, 30.0, 30.0), (1, 1): (1, 0.0, 30.0)}


def test_top_session_paths_hand_case(spark):
    from recdb_postgresql_spark.operators.funnel import top_session_paths
    M = 60 * 10 ** 9
    rows = [
        # user 1, session 1: view > click   (1 min apart)
        (1, 1, 0 * M, "view"), (1, 2, 1 * M, "click"),
        # user 1, session 2 after a 2h gap: view > click
        (1, 3, 180 * M, "view"), (1, 4, 181 * M, "click"),
        # user 2, one session: view > click
        (2, 5, 0 * M, "view"), (2, 6, 5 * M, "click"),
        # user 3, lone purchase
        (3, 7, 0 * M, "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts",
                                      "event_type"])
    out = top_session_paths(ev, k=5).collect()
    assert (out[0]["path"], out[0]["n_sessions"]) == ("view>click", 3)
    assert (out[1]["path"], out[1]["n_sessions"]) == ("purchase", 1)


def test_top_session_paths_truncates_and_orders(spark):
    from recdb_postgresql_spark.operators.funnel import top_session_paths
    S = 10 ** 9
    # 10 events in one session, max_len 3: only the first 3 survive;
    # out-of-order insertion must not change the path
    rows = [(1, i, (10 - i) * S, f"e{10 - i}") for i in range(1, 11)]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts",
                                      "event_type"])
    out = top_session_paths(ev, k=5, max_len=3).collect()
    assert len(out) == 1
    assert out[0]["path"] == "e0>e1>e2"


def test_markov_transitions_counts_and_start(spark):
    from pyspark.sql import functions as F
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
            (2, 1, "a"), (2, 2, "a")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"]) \
              .withColumn("event_id", F.col("ts"))
    got = {(r["from_state"], r["to_state"]): (r["n"], r["p"])
           for r in funnel.markov_transitions(df).collect()}
    assert got[("_start", "a")] == (2, 1.0)
    assert got[("a", "b")] == (1, 0.5)
    assert got[("a", "a")] == (1, 0.5)
    assert got[("b", "a")] == (1, 1.0)
    assert sum(n for n, _ in got.values()) == 5


def test_rfm_segments_semantics(spark):
    from pyspark.sql import functions as F
    # user 1: old, rare, cheap; user 2: fresh, frequent, big spender
    rows = [(1, 0, 1.0), (2, 100, 10.0), (2, 200, 10.0),
            (2, 300, 10.0), (3, 150, 5.0), (3, 250, 5.0)]
    df = (spark.createDataFrame(rows, ["user_id", "d", "value"])
          .select("user_id",
                  (F.col("d") * 86400 * 10 ** 9).alias("ts"), "value"))
    from recdb_postgresql_spark.operators import funnel
    out = {r["user_id"]: r
           for r in funnel.rfm_segments(df, n_tiles=3).collect()}
    assert out[2]["segment"] == "333" and out[1]["segment"] == "111"
    assert out[1]["recency_days"] == 300.0
    assert out[2]["monetary"] == 30.0 and out[2]["frequency"] == 3
    assert out[3]["r"] == 2 and out[3]["f"] == 2 and out[3]["m"] == 2


def test_markov_attribution_gateway_channel(spark):
    from recdb_postgresql_spark.operators import funnel
    # every conversion flows through 'b': _start -> a -> b -> buy for
    # half the users, _start -> b -> buy for the rest; 'c' is a dead
    # end no converter touches
    rows = []
    eid = 0
    for u in range(10):
        path = (["a", "b", "buy"] if u % 2 == 0 else ["b", "buy"]) \
            if u < 8 else ["c"]
        for i, t in enumerate(path):
            rows.append((u, eid, i + 1, t))
            eid += 1
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts",
                                      "event_type"])
    out = {r["channel"]: r for r in funnel.markov_attribution(
        df, ["a", "b", "c"], conv_type="buy").collect()}
    # severing b kills ALL conversion; severing a leaves the direct
    # _start->b->buy path; c contributes nothing
    assert out["b"]["removal_effect"] > 0.99
    assert 0 < out["a"]["removal_effect"] < out["b"]["removal_effect"]
    assert abs(out["c"]["removal_effect"]) < 1e-9
    assert abs(out["c"]["attribution"]) < 1e-9
    s = sum(r["attribution"] for r in out.values())
    assert abs(s - 1.0) < 1e-9


def test_nelson_aalen_and_logrank(spark):
    from pyspark.sql import functions as F

    from recdb_postgresql_spark.operators import funnel
    D = funnel.DAY_NS
    # cohort A (even users): churn after ~1 day; cohort B: ~10 days;
    # a few of each censored (active at corpus end)
    rows = []
    eid = 0
    for u in range(20):
        life = 1 if u % 2 == 0 else 10
        last = life * D if u < 16 else 30 * D  # censored tail
        for ts in (0, last):
            rows.append((u, eid, ts)); eid += 1
    rows.append((99, eid, 40 * D))  # pins corpus max
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    na = funnel.nelson_aalen(df).collect()
    # hazard is nondecreasing and increments are d/n
    hs = [r["cum_hazard"] for r in sorted(na, key=lambda r: r["t_days"])]
    assert hs == sorted(hs)
    first = sorted(na, key=lambda r: r["t_days"])[0]
    assert abs(first["cum_hazard"]
               - first["n_churned"] / first["n_risk"]) < 1e-9
    lr = funnel.logrank_test(df, F.col("user_id") % 2 == 0).collect()[0]
    # cohort A churns much earlier -> strongly significant split
    assert lr["n_a"] == 10 and lr["n_b"] == 11
    assert abs(lr["z"]) > 1.9
    assert lr["chi2"] > 3.84
