"""Jaro-Winkler scorer: paper anchors, DuckDB bit-parity, rerank UDF."""

import random

import duckdb
import pytest

from recdb_postgresql_spark.operators.linkage import (_jaro_winkler_py,
                                                      jaro_winkler_pairs)


@pytest.mark.parametrize("a,b,expected", [
    ("MARTHA", "MARHTA", 0.9611111111111111),   # Winkler 1990 anchors
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),                # fuzzystrmatch: both-empty is 0
    ("ab", "ba", 0.0),            # window 0 -> same-position only
    ("abcdefgh", "abzzzzzz", 0.5),  # jaro <= 0.7 -> NO prefix boost
    ("aaaa", "aaaaaaaaaa", 0.88),
])
def test_jw_anchors(a, b, expected):
    assert _jaro_winkler_py(a, b) == pytest.approx(expected, abs=1e-12)


def test_jw_floored_transpositions_matches_duckdb_fuzz():
    # 500 random pairs must be bit-identical to DuckDB's
    # jaro_winkler_similarity — including odd mismatch counts where
    # the textbook fractional t diverges from the floored form.
    con = duckdb.connect()
    rng = random.Random(11)
    for _ in range(500):
        a = "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 14)))
        d = con.execute("select jaro_winkler_similarity(?, ?)",
                        [a, b]).fetchone()[0]
        assert _jaro_winkler_py(a, b) == d, (a, b)


def test_jw_pairs_udf(spark):
    df = spark.createDataFrame(
        [("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), (None, "x")],
        ["l", "r"])
    got = {(r["l"], r["r"]): r["jw"]
           for r in jaro_winkler_pairs(df, "l", "r").collect()}
    assert got[("MARTHA", "MARHTA")] == pytest.approx(0.9611111111111111)
    assert got[("DIXON", "DICKSONX")] == pytest.approx(0.8133333333333332)
    assert got[(None, "x")] == 0.0
