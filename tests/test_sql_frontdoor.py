"""RecSQL front door: DDL, RECOMMEND grammar, WHERE splitting,
materialized auto-resolution (OP_GENERATE -> OP_FILTER)."""

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.engine import RecEngine
from recdb_postgresql_spark.plans import RecSQL
from recdb_postgresql_spark.plans.sql_rewriter import _split_where


@pytest.fixture()
def rs(spark):
    rows = [(u, i, float((u * 3 + i) % 7 + 1))
            for u in range(1, 8) for i in range(1, 6)]
    spark.createDataFrame(rows, "userid long, itemid long, ratingval double") \
        .createOrReplaceTempView("sqlrat")
    return RecSQL(RecEngine(spark))


def test_where_split_true_substitution():
    u, rest = _split_where("userid IN (1,2) AND itemid < 7 AND ratingval >= 4", "userid")
    assert u == "userid IN (1,2)"
    assert rest == "itemid < 7 AND ratingval >= 4"
    assert _split_where(None, "userid") == (None, None)
    assert _split_where("itemid = 3", "userid") == (None, "itemid = 3")


def test_recommend_grammar_end_to_end(rs):
    out = rs.sql("SELECT * FROM sqlrat RECOMMEND itemid TO userid ON ratingval "
                 "USING ItemCosCF WHERE userid = 2 ORDER BY ratingval DESC LIMIT 3")
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.userid == 2 for r in rows)
    scores = [r.ratingval for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_auto_resolution_uses_materialized(rs):
    rs.sql("CREATE RECOMMENDER sqlrec ON sqlrat USERS FROM userid "
           "ITEMS FROM itemid EVENTS FROM ratingval USING UserCosCF")
    rs.sql("SELECT * FROM sqlrat RECOMMEND itemid TO userid ON ratingval "
           "USING UserCosCF WHERE userid = 1 LIMIT 2").collect()
    info = rs.engine.catalog.get("sqlrec")
    assert info.query_counter == 1          # FilterRecommend path taken
    assert info.eventtable == "sqlrat"
    rs.sql("DROP RECOMMENDER sqlrec")
    assert rs.engine.catalog.get("sqlrec") is None


def test_passthrough_plain_sql(rs):
    assert rs.sql("SELECT COUNT(*) AS n FROM sqlrat").collect()[0].n == 35
