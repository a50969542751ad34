"""The reference's own regression script, end-to-end through RecSQL.

Mirrors ``PostgreSQL/recdb_regression_test.sql:1-42`` statement for
statement: per method, CREATE RECOMMENDER -> RECOMMEND (materialized)
-> DROP -> RECOMMEND (on-the-fly); then the miscellaneous shapes
(IN-list + item filter, dimension join + ILIKE, ORDER BY/LIMIT top-k,
score threshold). Fixtures follow FIXTURES.md (ml_ratings, ml_items).
"""

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.engine import RecEngine
from recdb_postgresql_spark.plans import RecSQL

GENRES = ["Drama|Romance", "Action|Thriller", "Comedy", "Drama",
          "Action|Comedy", "Documentary"]


@pytest.fixture(scope="module")
def rs(spark):
    rows = [(u, i, float((u * 7 + i * 13) % 9) / 2 + 0.5)
            for u in range(1, 21) for i in range(20) if (u + i) % 4]
    spark.createDataFrame(rows, "userid long, itemid long, ratingval double") \
        .createOrReplaceTempView("ml_ratings")
    items = [(i, f"Movie {i}", GENRES[i % len(GENRES)]) for i in range(20)]
    spark.createDataFrame(items, "itemid long, name string, genre string") \
        .createOrReplaceTempView("ml_items")
    return RecSQL(RecEngine(spark, svd_features=3, svd_epochs=2))


N_ITEMS = 20
N_USER1_ITEMS = N_ITEMS  # all items are scored for the target user


@pytest.mark.parametrize("method", ["itemcoscf", "itempearcf", "usercoscf",
                                    "userpearcf", "svd"])
def test_method_materialized_and_onthefly(rs, method):
    rs.sql(f"CREATE RECOMMENDER MovieRec ON ml_ratings USERS FROM userid "
           f"ITEMS FROM itemid EVENTS FROM ratingval USING {method}")
    mat = rs.sql(f"SELECT * FROM ml_ratings RECOMMEND itemid TO userid "
                 f"ON ratingval USING {method} WHERE userid = 1").collect()
    rs.sql("DROP RECOMMENDER MovieRec")
    fly = rs.sql(f"SELECT * FROM ml_ratings RECOMMEND itemid TO userid "
                 f"ON ratingval USING {method} WHERE userid = 1").collect()
    assert len(mat) == N_USER1_ITEMS and len(fly) == N_USER1_ITEMS
    if method != "svd":  # CF is deterministic across train runs
        # plans differ (materialized reads a table; on-the-fly computes),
        # so double accumulation order differs in the last ulps — compare
        # at the engine's 6dp oracle precision
        r6 = lambda rows: sorted((r[0], r[1], round(r[2], 6)) for r in rows)
        assert r6(mat) == r6(fly)


def test_misc_inlist_and_item_filter(rs):
    out = rs.sql("SELECT * FROM ml_ratings RECOMMEND itemid TO userid ON "
                 "ratingval USING itemcoscf "
                 "WHERE userid IN (1,2,3,5,9) AND itemid < 7").collect()
    assert {r.userid for r in out} == {1, 2, 3, 5, 9}
    assert all(r.itemid < 7 for r in out)


def test_misc_join_ilike(rs):
    out = rs.sql(
        "SELECT r.itemid,r.ratingval,i.name,i.genre FROM ml_ratings r, ml_items i "
        "RECOMMEND r.itemid TO r.userid ON r.ratingval USING itemcoscf "
        "WHERE r.userid = 1 AND r.itemid = i.itemid AND i.genre ILIKE '%drama%'"
    ).collect()
    assert len(out) > 0
    assert all("drama" in r.genre.lower() for r in out)
    assert out[0].__fields__ == ["itemid", "ratingval", "name", "genre"]


def test_misc_orderby_limit(rs):
    out = rs.sql("SELECT * FROM ml_ratings RECOMMEND itemid TO userid ON "
                 "ratingval USING itemcoscf WHERE userid = 1 "
                 "ORDER BY ratingval DESC LIMIT 10").collect()
    assert len(out) == 10
    scores = [r.ratingval for r in out]
    assert scores == sorted(scores, reverse=True)


def test_misc_join_ilike_orderby_limit(rs):
    out = rs.sql(
        "SELECT r.itemid,r.ratingval,i.name,i.genre FROM ml_ratings r, ml_items i "
        "RECOMMEND r.itemid TO r.userid ON r.ratingval USING itemcoscf "
        "WHERE r.userid = 1 AND r.itemid = i.itemid AND i.genre ILIKE '%action%' "
        "ORDER BY ratingval DESC LIMIT 5").collect()
    assert 0 < len(out) <= 5
    assert all("action" in r.genre.lower() for r in out)


def test_misc_score_threshold(rs):
    out = rs.sql("SELECT * FROM ml_ratings RECOMMEND itemid TO userid ON "
                 "ratingval USING itemcoscf WHERE userid = 1 "
                 "AND ratingval >= 2.5").collect()
    assert all(r.ratingval >= 2.5 for r in out)


def test_recsql_view_route_indexrecommend(rs, spark):
    """R6/R19 through the SQL front door: once a RecView exists and the
    statement is provably answerable from the capped view (user-only
    WHERE + ORDER BY score DESC LIMIT n <= tail_length), RecSQL routes
    it to the stored predictions and labels the strategy
    IndexRecommend; deeper or item-filtered reads fall back to live
    scoring (execRecommend.c:151-294; capped-view exactness argument
    in RecSQL._try_view_route)."""
    eng = RecEngine(spark, tail_length=5)
    sql = RecSQL(eng)
    sql.sql("CREATE RECOMMENDER ViewRec ON ml_ratings USERS FROM userid "
            "ITEMS FROM itemid EVENTS FROM ratingval USING itemcoscf")
    q = ("SELECT * FROM ml_ratings RECOMMEND itemid TO userid ON ratingval "
         "USING itemcoscf WHERE userid = 3 ORDER BY ratingval DESC LIMIT 3")
    live = sql.sql(q).collect()
    assert sql.last_strategy == "FilterRecommend"  # no view yet
    eng.materialize_predictions("viewrec", spark.table("ml_ratings"))
    routed = sql.sql(q).collect()
    assert sql.last_strategy == "IndexRecommend"
    # parity vs the live path (scores; item ties at the boundary may
    # break differently between the two top-k implementations)
    assert len(routed) == len(live) == 3
    assert all(r.userid == 3 for r in routed)
    assert ([round(r.ratingval, 6) for r in routed]
            == [round(r.ratingval, 6) for r in live])
    # k > cap must NOT route: the capped view may miss needed rows
    deep = q.replace("LIMIT 3", "LIMIT 8")
    out = sql.sql(deep).collect()
    assert sql.last_strategy == "FilterRecommend" and len(out) == 8
    # an item predicate can dig past the per-user cap: no route
    itemq = ("SELECT * FROM ml_ratings RECOMMEND itemid TO userid ON "
             "ratingval USING itemcoscf WHERE userid = 3 AND itemid < 100 "
             "ORDER BY ratingval DESC LIMIT 3")
    sql.sql(itemq).collect()
    assert sql.last_strategy == "FilterRecommend"
    # R19: explain() carries the same label for the view path
    assert eng.explain(spark.table("ml_ratings"), "userid", "itemid",
                       "ratingval", "itemcoscf", name="viewrec",
                       use_view=True).startswith(
        "Recommend strategy: IndexRecommend")
    sql.sql("DROP RECOMMENDER ViewRec")
