"""Hand-computed CF semantics, including the reference's quirks
(SURVEY.md §7 "Quirk preservation")."""

import math

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import cf


@pytest.fixture(scope="module")
def tiny(spark):
    # users 1..3, items 10/20/30; item 30 rated by one user only
    rows = [(1, 10, 4.0), (1, 20, 2.0),
            (2, 10, 5.0), (2, 20, 1.0),
            (3, 30, 3.0)]
    return spark.createDataFrame(rows, "user long, item long, rating double") \
        .groupBy("user", "item").agg(F.avg("rating").alias("rating"))


def test_item_cos_math(tiny):
    m = {(r.item1, r.item2): r.similarity
         for r in cf.train_item_cos(tiny).collect()}
    # sim(10,20) = (4*2 + 5*1) / (sqrt(16+25)*sqrt(4+1))
    expected = 13 / (math.sqrt(41) * math.sqrt(5))
    assert m[(10, 20)] == pytest.approx(expected)
    # item 30 shares no raters with anyone -> absent (sim<=0 dropped)
    assert all(30 not in k for k in m)


def test_item_pearson_keeps_negatives(tiny):
    m = {(r.item1, r.item2): r.similarity
         for r in cf.train_item_pearson(tiny).collect()}
    # centered: item10 -> (4-4.5, 5-4.5); item20 -> (2-1.5, 1-1.5)
    # dot = (-.5)(.5) + (.5)(-.5) = -0.5 ; p10 = p20 = sqrt(0.5)
    assert m[(10, 20)] == pytest.approx(-0.5 / 0.5)
    # single-rater item 30 has p=0 -> dropped, not NaN
    assert all(not math.isnan(v) for v in m.values())
    assert all(30 not in k for k in m)


def test_user_cf_target_average_quirk(spark):
    # users 1,2 co-rate item 10; user 2 also rated item 20.
    rows = [(1, 10, 4.0), (2, 10, 4.0), (2, 20, 5.0)]
    r = spark.createDataFrame(rows, "user long, item long, rating double")
    model = cf.train_user_cos(r)
    users = r.select("user").distinct()
    items = r.select("item").distinct()
    scored = {(x.user, x.item): x.score
              for x in cf.predict_user_cf(model, r, users, items).collect()}
    sim = model.collect()[0].similarity
    # score(1,20) = avg(1) + sim*(r(2,20) - avg(1))/|sim|  [TARGET user's avg]
    avg1 = 4.0
    assert scored[(1, 20)] == pytest.approx(avg1 + sim * (5.0 - avg1) / abs(sim))
    # already-rated items are still scored (pending list holds ALL items)
    assert (1, 10) in scored and (2, 10) in scored


def test_cos_zero_norm_vectors_dropped_not_error(spark):
    """An all-zero rating vector (possible after cap_coraters drops an
    entity's nonzero rows) has norm 0; its cosine is 0/0 and the
    reference's sim>0 cut would drop it anyway — the build must filter
    it BEFORE the division (ANSI mode errors otherwise; found by the
    x100 cf decade probe)."""
    rows = [(1, 10, 4.0), (1, 20, 2.0),
            (2, 10, 5.0), (2, 20, 1.0),
            (3, 10, 0.0), (3, 20, 0.0)]   # user 3: all-zero vector
    df = spark.createDataFrame(rows, "user long, item long, rating double")
    users = {frozenset((r.user1, r.user2))
             for r in cf.train_user_cos(df).collect()}
    assert frozenset((1, 2)) in users
    assert all(3 not in p for p in users)
    # transposed hazard: an all-zero ITEM vector on the item-cos side
    rows_i = [(1, 10, 4.0), (2, 10, 5.0),
              (1, 20, 2.0), (2, 20, 1.0),
              (1, 30, 0.0), (2, 30, 0.0)]  # item 30: all-zero vector
    df_i = spark.createDataFrame(rows_i, "user long, item long, rating double")
    items = {frozenset((r.item1, r.item2))
             for r in cf.train_item_cos(df_i).collect()}
    assert frozenset((10, 20)) in items
    assert all(30 not in p for p in items)


def test_item_cf_zero_when_unreachable(spark):
    # two disconnected item groups -> cross-group predictions are 0
    rows = [(1, 10, 5.0), (1, 20, 3.0), (2, 30, 4.0), (2, 40, 2.0)]
    r = spark.createDataFrame(rows, "user long, item long, rating double")
    model = cf.train_item_cos(r)
    users = r.select("user").distinct()
    items = r.select("item").distinct()
    scored = {(x.user, x.item): x.score
              for x in cf.predict_item_cf(model, r, users, items).collect()}
    assert scored[(1, 30)] == 0.0
    assert scored[(2, 10)] == 0.0
    # full user x item grid is emitted
    assert len(scored) == 8


def test_cap_coraters_bounds_hot_key_only(spark):
    # item 1 is "hot" (6 raters > cap 3); item 2 is cold (2 raters).
    rows = [(u, 1, float(u)) for u in range(1, 7)] + \
           [(1, 2, 2.0), (2, 2, 3.0)]
    r = spark.createDataFrame(rows, "user long, item long, rating double")
    capped = cf.cap_coraters(r, "user", "item", 3)
    by_item = {x.item: x.cnt for x in
               capped.groupBy("item").agg(F.count("*").alias("cnt")).collect()}
    assert by_item == {1: 3, 2: 2}       # hot capped, cold untouched
    # deterministic: same survivors on re-evaluation
    s1 = {(x.user, x.item) for x in capped.collect()}
    s2 = {(x.user, x.item) for x in capped.collect()}
    assert s1 == s2


def test_materialized_user_cf_build_applies_cap(spark, monkeypatch):
    """create_recommender (the persisted-model path) must bound the
    quadratic pair fan-out by default; uncapped this hot item would
    emit C(10,2)=45 model pairs, capped at 3 raters it emits <= 3."""
    from recdb_postgresql_spark.engine import RecEngine

    monkeypatch.setattr(cf, "AUTO_CORATER_CAP", 3)
    rows = [(u, 1, float(u % 4 + 1)) for u in range(1, 11)]
    ev = spark.createDataFrame(rows, "userid long, itemid long, ratingval double")
    eng = RecEngine(spark)
    eng.create_recommender("capped_rec", ev, "userid", "itemid",
                           "ratingval", "usercoscf")
    model = eng.catalog.load_models(eng.catalog.get("capped_rec"),
                                    spark)["model"]
    assert model.count() <= 3
    eng.drop_recommender("capped_rec")


def test_materialized_item_cf_build_caps_power_users(spark, monkeypatch):
    """The symmetric hot key: item-CF's pair join is quadratic in
    items-per-USER. A power user rating 10 items would emit C(10,2)=45
    pairs; capped at 3 items per user the materialized build emits
    <= 3, and a below-cap build is bit-identical to the exact model."""
    from recdb_postgresql_spark.engine import RecEngine

    monkeypatch.setattr(cf, "AUTO_CORATER_CAP", 3)
    rows = [(1, i, float(i % 4 + 1)) for i in range(1, 11)]
    ev = spark.createDataFrame(rows, "userid long, itemid long, ratingval double")
    eng = RecEngine(spark)
    eng.create_recommender("capped_item_rec", ev, "userid", "itemid",
                           "ratingval", "itemcoscf")
    model = eng.catalog.load_models(eng.catalog.get("capped_item_rec"),
                                    spark)["model"]
    assert model.count() <= 3
    eng.drop_recommender("capped_item_rec")
    # below the cap the filter is a no-op: exact parity
    cold = spark.createDataFrame(
        [(u, i, float(u + i)) for u in range(1, 4) for i in range(1, 4)],
        "user long, item long, rating double")
    exact = {(r.item1, r.item2, round(r.similarity, 9))
             for r in cf.train_item_cos(cold).collect()}
    capped = {(r.item1, r.item2, round(r.similarity, 9))
              for r in cf.train_item_cos(cold, max_coraters=3).collect()}
    assert exact == capped and exact


def test_halflife_none_identical_plan_and_values(spark):
    """half_life=None must be EXACTLY today's unweighted path — same
    optimized plan (no decay nodes sneak in), same values — so every
    existing CF caller is untouched by the new parameters."""
    rows = [(1, 10, 4.0, 100), (1, 20, 2.0, 200), (2, 10, 5.0, 300)]
    ev = spark.createDataFrame(
        rows, "user long, item long, val double, ts long")
    plain = cf.normalize_events(ev, "user", "item", "val")
    none_hl = cf.normalize_events(ev, "user", "item", "val",
                                  ts_col="ts", half_life=None)
    import re

    def norm(df):  # expression ids (#12) differ run to run
        return re.sub(r"#\d+", "#",
                      df._jdf.queryExecution().optimizedPlan().toString())

    assert norm(none_hl) == norm(plain)
    assert sorted(map(tuple, none_hl.collect())) \
        == sorted(map(tuple, plain.collect()))


def test_halflife_decay_math(spark):
    """Hand-computed decay: age measured from the newest event in the
    frame, weight 2^(-age/half_life), rating = avg of weighted values."""
    rows = [(1, 10, 8.0, 0),      # age 20 at tmax=20
            (1, 10, 4.0, 10),     # age 10
            (2, 10, 6.0, 20)]     # the newest event: weight 1
    ev = spark.createDataFrame(
        rows, "user long, item long, val double, ts long")
    got = {(r.user, r.item): r.rating
           for r in cf.normalize_events(ev, "user", "item", "val",
                                        ts_col="ts",
                                        half_life=10.0).collect()}
    # (8*2^-2 + 4*2^-1) / 2 = (2 + 2) / 2 = 2
    assert got[(1, 10)] == pytest.approx(2.0)
    assert got[(2, 10)] == pytest.approx(6.0)
    # huge half-life converges to the unweighted average
    near = {(r.user, r.item): r.rating
            for r in cf.normalize_events(ev, "user", "item", "val",
                                         ts_col="ts",
                                         half_life=1e15).collect()}
    assert near[(1, 10)] == pytest.approx(6.0, rel=1e-6)


def test_halflife_requires_ts_col(spark):
    ev = spark.createDataFrame([(1, 10, 4.0)],
                               "user long, item long, val double")
    with pytest.raises(ValueError, match="ts_col"):
        cf.normalize_events(ev, "user", "item", "val", half_life=10.0)


def test_popularity_topk_excludes_rated_and_survives_heavy_rater(spark):
    """The bounded-candidate form must stay exact even when one user
    has rated MORE items than k: their top-k comes from candidates
    k + max-per-user deep, so exclusion can't starve them."""
    from pyspark.sql import functions as F

    from recdb_postgresql_spark.operators import cf

    # items 1..10 with popularity 10, 9, ..., 1; user 0 rated the top
    # 5 items, user 1 rated nothing (cold start)
    rows = []
    for item in range(1, 11):
        for u in range(100, 100 + (11 - item)):
            rows.append((u, item, 3.0))
    for item in range(1, 6):
        rows.append((0, item, 5.0))
    r = spark.createDataFrame(rows, "user long, item long, rating double")
    users = spark.createDataFrame([(0,), (1,)], "user long")
    out = cf.popularity_topk(r, users, k=3)
    got = {u: [row.item for row in rows_]
           for u, rows_ in
           ((u, sorted((x for x in out.collect() if x.user == u),
                       key=lambda x: (-x.n_raters, x.item)))
            for u in (0, 1))}
    assert got[1] == [1, 2, 3]        # cold user: plain top-3
    assert got[0] == [6, 7, 8]        # heavy rater skips their rated 1-5
