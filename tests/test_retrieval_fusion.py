"""Reciprocal-rank fusion: hand-checked scores, grouped (per-query)
mode, and the determinism/rounding contract."""

import pytest

from recdb_postgresql_spark.operators.similarity import rrf_fuse


def test_rrf_hand_checked(spark):
    # doc 1 ranks 1st lexically and 2nd semantically; doc 2 only
    # lexical; doc 3 only semantic (1st)
    lex = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    sem = spark.createDataFrame([(3, 1), (1, 2)], "doc_id long, rank int")
    out = {r.doc_id: (r.rrf, r.n_lists)
           for r in rrf_fuse([lex, sem], k0=60, k=10).collect()}
    assert out[1] == (round(1 / 61 + 1 / 62, 6), 2)
    assert out[2] == (round(1 / 62, 6), 1)
    assert out[3] == (round(1 / 61, 6), 1)
    # fusion ordering: the doc in both lists wins
    top = rrf_fuse([lex, sem], k0=60, k=1).collect()
    assert top[0].doc_id == 1


def test_rrf_grouped_per_query(spark):
    lex = spark.createDataFrame(
        [("q1", 1, 1), ("q2", 2, 1)], "qid string, doc_id long, rank int")
    sem = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 9, 2), ("q2", 8, 1)],
        "qid string, doc_id long, rank int")
    rows = rrf_fuse([lex, sem], k0=60, k=2, group_cols=("qid",)).collect()
    byq = {}
    for r in rows:
        byq.setdefault(r.qid, []).append((r.rank, r.doc_id))
    assert sorted(byq["q1"]) == [(1, 1), (2, 9)]   # doc 1 in both lists
    assert sorted(byq["q2"]) == [(1, 2), (2, 8)]   # tie broken by doc_id


def test_rrf_tie_breaks_by_id(spark):
    a = spark.createDataFrame([(5, 1), (3, 1)], "doc_id long, rank int")
    rows = rrf_fuse([a], k0=60, k=2).collect()
    # equal rrf -> ascending doc_id first
    assert [r.doc_id for r in rows] == [3, 5]


def test_rrf_ungrouped_schema_matches_grouped(spark):
    """Both modes return an explicit rank column — downstream code must
    never depend on implicit row order, which any shuffle destroys."""
    lex = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    sem = spark.createDataFrame([(3, 1), (1, 2)], "doc_id long, rank int")
    out = rrf_fuse([lex, sem], k0=60, k=10)
    assert out.columns == ["doc_id", "rrf", "n_lists", "rank"]
    ranks = {r.doc_id: r.rank for r in out.collect()}
    assert ranks[1] == 1  # doc in both lists fuses to the top
