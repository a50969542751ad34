"""Bloom pre-filter semantics: never a false negative, bounded false
positives, exactness of the composed semi-join (oracle parity covers
the corpus-scale query)."""

import os
import sys

from pyspark.sql import Row, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recdb_postgresql_spark.functions.bloom import (
    bloom_build, bloom_might_contain, bloom_semijoin)


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom_build(keys, F.col("k"), m_bits=1 << 14, k=3)
    hits = keys.where(bloom_might_contain(F.col("k"), words, k=3)).count()
    assert hits == 500          # every inserted key must test positive


def test_bloom_false_positive_rate_bounded(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom_build(keys, F.col("k"), m_bits=1 << 14, k=3)
    probe = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    fp = probe.where(bloom_might_contain(F.col("k"), words, k=3)).count()
    # n=500, m=2^14, k=3 -> theoretical fp ~ (1-e^(-3*500/16384))^3
    # ~ 6e-4; allow 10x slack over 20k probes (~12 expected at bound)
    assert fp <= 120


def test_bloom_semijoin_exact_and_empty_dim(spark):
    fact = spark.createDataFrame(
        [Row(k=i % 50, v=i) for i in range(1000)])
    dim = spark.createDataFrame([Row(d=i) for i in range(0, 50, 7)])
    got = sorted((r["k"], r["v"]) for r in
                 bloom_semijoin(fact, dim, "k", "d").collect())
    want = sorted((r["k"], r["v"]) for r in fact.join(
        dim.select(F.col("d").alias("k")).distinct(),
        "k", "left_semi").collect())
    assert got == want
    empty = dim.where(F.lit(False))
    assert bloom_semijoin(fact, empty, "k", "d").count() == 0


def test_bloom_prefilter_runs_before_the_join(spark):
    """The membership test must sit on the fact scan side (a Filter
    containing xxhash64 below the join), not after it."""
    fact = spark.range(0, 1000).select(F.col("id").alias("k"))
    dim = spark.range(0, 10).select(F.col("id").alias("d"))
    df = bloom_semijoin(fact, dim, "k", "d")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert plan.index("xxhash64") > plan.index("Join") \
        or "Filter" in plan        # filter present in the fact subtree
    # semantics double-check: survivors only
    assert df.count() == 10
