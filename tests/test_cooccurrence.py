"""Item co-occurrence / association stats: hand-checked lift and PMI,
min_support pruning, and the hot-user cap knob."""

import math

from recdb_postgresql_spark.operators.cf import item_cooccurrence


def _ratings(spark, rows):
    return spark.createDataFrame(rows, "user long, item long, rating double")


def test_cooccurrence_hand_checked(spark):
    # 4 users; items 1&2 co-occur for users 10,11; item 3 only user 10
    rows = [(10, 1, 1.0), (10, 2, 1.0), (10, 3, 1.0),
            (11, 1, 1.0), (11, 2, 1.0),
            (12, 1, 1.0),
            (13, 2, 1.0)]
    out = {(r.item1, r.item2): r
           for r in item_cooccurrence(_ratings(spark, rows),
                                      min_support=2).collect()}
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert (r.n_both, r.n1, r.n2) == (2, 3, 3)
    lift = 2 * 4 / (3 * 3)
    assert r.lift == round(lift, 6)
    assert r.pmi == round(math.log(lift), 6)


def test_cooccurrence_min_support_and_dedup(spark):
    # duplicate (user,item) rows collapse before pair counting
    rows = [(10, 1, 1.0), (10, 1, 2.0), (10, 2, 1.0),
            (11, 1, 1.0), (11, 2, 1.0)]
    out = item_cooccurrence(_ratings(spark, rows), min_support=3).collect()
    assert out == []  # n_both=2 < 3
    out2 = {(r.item1, r.item2): r.n_both
            for r in item_cooccurrence(_ratings(spark, rows),
                                       min_support=2).collect()}
    assert out2 == {(1, 2): 2}


def test_cooccurrence_cap_bounds_fanout(spark):
    # one user interacting with 30 items -> 435 pairs uncapped; the
    # md5-rank cap keeps at most max_n items per user -> <= C(5,2)
    rows = [(1, i, 1.0) for i in range(30)]
    full = item_cooccurrence(_ratings(spark, rows), min_support=1)
    assert full.count() == 30 * 29 // 2
    capped = item_cooccurrence(_ratings(spark, rows), min_support=1,
                               max_coraters=5)
    assert capped.count() <= 5 * 4 // 2


def test_negative_samples_disjoint_and_deterministic(spark):
    from recdb_postgresql_spark.operators.cf import negative_samples

    rows = [(u, i, 1.0) for u in range(5) for i in range(20) if (u + i) % 3]
    r = _ratings(spark, rows)
    neg = negative_samples(r, k=3, oversample=4)
    got = {(x.user, x.item) for x in neg.collect()}
    pos = {(u, i) for u, i, _ in rows}
    assert got and not (got & pos)          # never a positive
    per_user = {}
    for u, i in got:
        per_user.setdefault(u, set()).add(i)
    assert all(len(v) <= 3 for v in per_user.values())
    # deterministic under repartitioning
    again = {(x.user, x.item) for x in
             negative_samples(r.repartition(7), k=3, oversample=4).collect()}
    assert again == got


def test_fpgrowth_planted_rule(spark):
    """Planted 3-itemset: most users holding {1,2} also hold 3 —
    exact confidence / lift / support values pinned."""
    from recdb_postgresql_spark.operators.cf import fpgrowth_rules
    rows = []
    # 8 users with {1,2,3}; 2 with {1,2}; 10 with {9} only
    for u in range(8):
        rows += [(u, i, 1.0) for i in (1, 2, 3)]
    for u in (8, 9):
        rows += [(u, i, 1.0) for i in (1, 2)]
    for u in range(10, 20):
        rows.append((u, 9, 1.0))
    df = spark.createDataFrame(rows, ["user", "item", "rating"])
    out = fpgrowth_rules(df, min_support=0.1, min_confidence=0.5)
    rules = {(tuple(r["antecedent"]), r["consequent"]): r
             for r in out.collect()}
    r12_3 = rules[((1, 2), 3)]
    assert abs(r12_3["confidence"] - 0.8) < 1e-6      # 8 of 10
    # lift = conf / P(3) = 0.8 / (8/20)
    assert abs(r12_3["lift"] - 2.0) < 1e-6
    assert abs(r12_3["support"] - 8 / 20) < 1e-6
    # a lone-item basket never generates rules about it
    assert all(9 not in (list(a) + [c]) for a, c in rules)


def test_fpgrowth_antecedents_sorted(spark):
    from recdb_postgresql_spark.operators.cf import fpgrowth_rules
    rows = [(u, i, 1.0) for u in range(6) for i in (5, 2, 7)]
    df = spark.createDataFrame(rows, ["user", "item", "rating"])
    out = fpgrowth_rules(df, min_support=0.5, min_confidence=0.5).collect()
    assert out and all(list(r["antecedent"]) == sorted(r["antecedent"])
                       for r in out)


def test_wilson_small_sample_pulled_down(spark):
    """1-of-1 positive must NOT outrank 95-of-100 — the exact failure
    mode of sort-by-average; and the bound matches the closed form."""
    import math
    from recdb_postgresql_spark.operators.cf import wilson_topk
    rows = ([(u, 1, 80.0) for u in range(95)]
            + [(u, 1, 10.0) for u in range(95, 100)]
            + [(0, 2, 90.0)])                     # item 2: one rave
    df = spark.createDataFrame(rows, ["user", "item", "rating"])
    out = {r["item"]: r for r in
           wilson_topk(df, positive_threshold=50.0, k=10).collect()}
    assert out[1]["wilson_lb"] > out[2]["wilson_lb"]
    assert out[2]["pos_rate"] == 1.0              # raw mean says 100%
    n, p, z = 100.0, 0.95, 1.96
    z2 = z * z
    lb = ((p + z2 / (2 * n)
           - z * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n))
          / (1 + z2 / n))
    assert abs(out[1]["wilson_lb"] - round(lb, 6)) < 1e-9


def test_covisitation_directional_window(spark):
    from pyspark.sql import functions as F

    from recdb_postgresql_spark.operators import cf
    H = 3600 * 10 ** 9
    rows = [  # user, item, t
        (1, 10, 0 * H), (1, 20, 1 * H), (1, 30, 9 * H),
        (2, 10, 0 * H), (2, 20, 2 * H),
    ]
    df = spark.createDataFrame(rows, ["userid", "itemid", "ratingts"])
    got = {(r["itemid"], r["next_item"]): (r["n"], r["rank"])
           for r in cf.covisitation(df, window_ns=6 * H, k=3).collect()}
    # 10 -> 20 within window for both users; 20 -> 30 is 8h for user 1
    # (outside 6h); 30 follows nothing
    assert got[(10, 20)] == (2, 1)
    assert (20, 30) not in got and (20, 10) not in got
    assert all(k[0] != 30 for k in got)


def test_covisitation_fat_user_guard(spark):
    """One power user past max_user_events must raise (the per-user
    pair join is activity² in a single AQE-unsplittable task), and
    the guard must be a knob, not a constant. Since r11 the guard is
    folded into the pair join (no eager pre-count scan), so it fires
    at action time as a Spark USER_RAISED_EXCEPTION; None skips it."""
    import pytest

    from recdb_postgresql_spark.operators import cf
    H = 3600 * 10 ** 9
    rows = [(1, i % 7, i * H // 100) for i in range(40)]
    rows += [(2, 3, 0), (2, 4, H)]
    df = spark.createDataFrame(rows, ["userid", "itemid", "ratingts"])
    with pytest.raises(Exception, match="covisitation"):
        cf.covisitation(df, window_ns=6 * H, max_user_events=30).count()
    # under the budget the same frame computes fine
    assert cf.covisitation(df, window_ns=6 * H,
                           max_user_events=64).count() > 0
    # None = unguarded single-pass (explicit opt-out for trusted input)
    assert cf.covisitation(df, window_ns=6 * H,
                           max_user_events=None).count() > 0


def test_covisitation_eager_guard(spark):
    """eager_guard=True (ADVICE r11): the pre-count runs BEFORE the
    pair join is planned, so it raises a driver ValueError that no
    Catalyst predicate reordering can elide — the untrusted-ingest
    form of the fat-user guard (the lazy form is best-effort on
    composed plans)."""
    import pytest

    from recdb_postgresql_spark.operators import cf
    H = 3600 * 10 ** 9
    rows = [(1, i % 7, i * H // 100) for i in range(40)]
    rows += [(2, 3, 0), (2, 4, H)]
    df = spark.createDataFrame(rows, ["userid", "itemid", "ratingts"])
    with pytest.raises(ValueError, match="user 1=40"):
        cf.covisitation(df, window_ns=6 * H, max_user_events=30,
                        eager_guard=True)
    assert cf.covisitation(df, window_ns=6 * H, max_user_events=64,
                           eager_guard=True).count() > 0
