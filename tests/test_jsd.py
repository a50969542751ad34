"""Jensen-Shannon source divergence (operators/text.js_divergence):
identical distributions score 0, disjoint vocabularies score 1 bit,
and the zero-mass fold matches a dense numpy computation."""

import math

from recdb_postgresql_spark.operators import text


def _jsd_bits(p, q):
    out = 0.0
    for a, b in zip(p, q):
        m = (a + b) / 2
        if a > 0:
            out += 0.5 * a * math.log(a / m)
        if b > 0:
            out += 0.5 * b * math.log(b / m)
    return out / math.log(2)


def test_jsd_identical_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma", "s1"), (2, "alpha beta gamma", "s2")],
        ["doc_id", "text", "source"])
    rows = {r["source"]: r["jsd_bits"]
            for r in text.js_divergence(df).collect()}
    assert rows["s1"] == 0.0 and rows["s2"] == 0.0


def test_jsd_disjoint_is_one_bit(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha", "s1"), (2, "delta epsilon zeta", "s2")],
        ["doc_id", "text", "source"])
    rows = {r["source"]: r["jsd_bits"]
            for r in text.js_divergence(df).collect()}
    assert rows["s1"] == 1.0 and rows["s2"] == 1.0


def test_jsd_matches_dense_reference(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c", "s1"), (2, "a b b c c c d", "s2")],
        ["doc_id", "text", "source"])
    rows = {r["source"]: r for r in text.js_divergence(df).collect()}
    # dense distributions over the union vocabulary {a,b,c,d}
    p1 = [3 / 6, 2 / 6, 1 / 6, 0.0]
    p2 = [1 / 7, 2 / 7, 3 / 7, 1 / 7]
    expect = _jsd_bits(p1, p2)
    assert abs(rows["s1"]["jsd_bits"] - expect) < 1e-6
    assert abs(rows["s2"]["jsd_bits"] - expect) < 1e-6  # symmetric
    assert rows["s1"]["n_tokens"] == 6 and rows["s1"]["n_terms"] == 3
    assert rows["s2"]["n_docs"] == 1
