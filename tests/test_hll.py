"""Explicit HyperLogLog sketch (functions/sketch.py): register parity
with a Python md5 mirror, the MAX merge law, estimate accuracy, and
the small-range linear-counting branch."""

import hashlib
import math

from pyspark.sql import functions as F

from recdb_postgresql_spark.functions import sketch


def _py_registers(values, b=6):
    regs = {}
    rest = 60 - b
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx = h >> rest
        w = h % (1 << rest)
        rho = (rest + 1) - w.bit_length() if w > 0 else rest + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def test_hll_registers_match_python_mirror(spark):
    vals = list(range(200))
    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    got = {r["idx"]: r["rho"]
           for r in sketch.hll_build(df, "k", b=6).collect()}
    assert got == _py_registers(vals)


def test_hll_merge_law(spark):
    a = spark.createDataFrame([(v,) for v in range(500)], ["k"])
    b = spark.createDataFrame([(v,) for v in range(300, 900)], ["k"])
    u = a.unionByName(b)
    merged = sketch.hll_merge(sketch.hll_build(a, "k"),
                              sketch.hll_build(b, "k"))
    direct = sketch.hll_build(u, "k")
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, direct.collect()))
    # and the merged ESTIMATE equals the union's estimate
    em = sketch.hll_estimate(merged).collect()[0]
    ed = sketch.hll_estimate(direct).collect()[0]
    assert em["est_distinct"] == ed["est_distinct"]


def test_hll_estimate_accuracy(spark):
    # 64 registers -> relative std error ~1.04/sqrt(64) = 13%; 5000
    # distinct keys must land within 4 sigma
    n = 5000
    df = spark.createDataFrame([(f"key_{v}",) for v in range(n)], ["k"])
    est = sketch.hll_estimate(sketch.hll_build(df, "k")).collect()[0]
    assert abs(est["est_distinct"] / n - 1) < 0.52
    assert est["v_zero"] == 0


def test_hll_small_range_linear_counting(spark):
    # 5 distinct over 64 registers -> the m*ln(m/V) branch, which is
    # near-exact at tiny cardinalities (and deterministic given md5)
    df = spark.createDataFrame([(v % 5,) for v in range(50)], ["k"])
    est = sketch.hll_estimate(sketch.hll_build(df, "k")).collect()[0]
    regs = _py_registers(list(range(5)))
    v = 64 - len(regs)
    assert est["v_zero"] == v
    assert est["est_distinct"] == round(64.0 * math.log(64.0 / v), 4)


def test_hll_duplicates_do_not_move_registers(spark):
    once = spark.createDataFrame([(v,) for v in range(100)], ["k"])
    thrice = once.unionByName(once).unionByName(once)
    assert sorted(map(tuple, sketch.hll_build(once, "k").collect())) \
        == sorted(map(tuple, sketch.hll_build(thrice, "k").collect()))


def test_grouped_hll_matches_global_per_group_and_merges(spark):
    from pyspark.sql import functions as F

    from recdb_postgresql_spark.functions.sketch import (
        hll_build, hll_build_grouped, hll_estimate, hll_estimate_grouped)

    rows = ([("a", f"u{i}") for i in range(300)]
            + [("b", f"v{i}") for i in range(40)])
    df = spark.createDataFrame(rows, ["g", "u"])
    grouped = hll_build_grouped(df, "g", "u", b=6)
    est = {r["grp"]: r["est_distinct"]
           for r in hll_estimate_grouped(grouped, b=6).collect()}
    # each group's sketch is EXACTLY the global sketch of that slice
    for g in ("a", "b"):
        solo = hll_estimate(
            hll_build(df.where(F.col("g") == g), "u", b=6),
            b=6).collect()[0]["est_distinct"]
        assert est[g] == solo
    # register MAX-merge law: union of the two groups' registers ==
    # sketch of the union
    merged = (grouped.groupBy("idx").agg(F.max("rho").alias("rho")))
    all_est = hll_estimate(hll_build(df, "u", b=6), b=6) \
        .collect()[0]["est_distinct"]
    assert hll_estimate(merged, b=6).collect()[0]["est_distinct"] \
        == all_est


def test_kmv_jaccard_estimator_planted_overlap(spark):
    from pyspark.sql import functions as F

    from recdb_postgresql_spark.functions.sketch import (
        kmv_build_grouped, kmv_jaccard_pairs)

    # A = 0..999, B = 500..1499 -> true jaccard 500/1500 = 1/3;
    # C disjoint -> 0
    rows = ([("A", f"u{i}") for i in range(1000)]
            + [("B", f"u{i}") for i in range(500, 1500)]
            + [("C", f"w{i}") for i in range(300)])
    df = spark.createDataFrame(rows, ["g", "u"])
    sk = kmv_build_grouped(df, "g", "u", k=256)
    # sketch size law: min(k, distinct) rows per group
    import collections
    szs = collections.Counter(r["grp"] for r in sk.collect())
    assert szs == {"A": 256, "B": 256, "C": 256}
    est = {(r["grp1"], r["grp2"]): r["est_jaccard"]
           for r in kmv_jaccard_pairs(sk, k=256).collect()}
    assert abs(est[("A", "B")] - 1 / 3) < 0.08
    assert est[("A", "C")] == 0.0 and est[("B", "C")] == 0.0
    # duplicates in the fact stream don't change the sketch
    sk2 = kmv_build_grouped(df.unionByName(df), "g", "u", k=256)
    assert sorted(map(tuple, sk.collect())) == \
        sorted(map(tuple, sk2.collect()))
