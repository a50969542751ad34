"""Misra-Gries heavy hitters: deterministic guarantee under
adversarial orderings and the two-level merge."""

from collections import Counter

from pyspark.sql import functions as F

from recdb_postgresql_spark.functions.sketch import misra_gries


def _check(spark, rows, k, parts):
    df = spark.createDataFrame([(x,) for x in rows], ["u"]) \
        .repartition(parts)
    got = {r["key"]: r["est_count"]
           for r in misra_gries(df, F.col("u"), k).collect()}
    true = Counter(rows)
    bound = len(rows) / (k + 1)
    assert len(got) <= k
    for kk, est in got.items():
        assert true[kk] - 2 * bound <= est <= true[kk], (kk, est, true[kk])
    # every key with frequency > 2N/(k+1) must be present (merged
    # two-level summary: per-partition + merge each cost <= N/(k+1))
    for kk, c in true.items():
        if c > 2 * bound:
            assert kk in got, (kk, c, bound)
    return got, true, bound


def test_mg_planted_heavies_survive_any_layout(spark):
    # one dominant key + mid keys + a wide tail, several layouts
    rows = (["hot"] * 5000 + [f"mid{i}" for i in range(20) for _ in range(300)]
            + [f"tail{j}" for j in range(8000)])
    for parts in (1, 4, 13):
        got, true, _ = _check(spark, rows, k=32, parts=parts)
        assert "hot" in got
    # adversarial: heavies all at the END of the stream order
    ordered = [f"tail{j}" for j in range(8000)] + ["hot"] * 5000
    got, _, _ = _check(spark, ordered, k=32, parts=1)
    assert "hot" in got


def test_mg_exact_when_keys_fit(spark):
    # <= k distinct keys: MG is exact (no decrements ever fire)
    rows = ["a"] * 10 + ["b"] * 5 + ["c"] * 2
    df = spark.createDataFrame([(x,) for x in rows], ["u"]).repartition(3)
    got = {r["key"]: r["est_count"]
           for r in misra_gries(df, F.col("u"), 8).collect()}
    assert got == {"a": 10, "b": 5, "c": 2}
