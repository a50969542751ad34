"""Scale layout assertions: bucketed joins skip the shuffle, salted
joins preserve results."""

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.functions.skew import salted_join
from recdb_postgresql_spark.sources.readers import load_table
from recdb_postgresql_spark.sources.sinks import write_bucketed


def test_bucketed_join_no_shuffle(spark):
    # uses the session's default warehouse dir (spark-warehouse/, gitignored)
    ev = load_table(spark, "/root/testdata/sf0.001", "events") \
        .select("user_id", "event_type", "value")
    write_bucketed(ev, "ev_bucketed", "user_id", buckets=8)
    t = spark.table("ev_bucketed")
    # self-aggregate + self-join on the bucket key: bucketed side needs
    # no Exchange before the join
    agg = t.groupBy("user_id").agg(F.sum("value").alias("total"))
    joined = t.join(agg, "user_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert joined.count() == ev.count()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    spark.sql("DROP TABLE ev_bucketed")


def test_salted_join_equivalent(spark):
    left = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, i) for i in range(5)],
        "k long, v long")
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")],
                                  "k long, name string")
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", salt=4)
    p = sorted((r.k, r.v, r.name) for r in plain.collect())
    s = sorted((r.k, r.v, r.name) for r in salted.collect())
    assert p == s and len(p) == 55
