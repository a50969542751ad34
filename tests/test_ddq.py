"""DDSketch-style quantile sketch (functions/sketch.py): bucket
parity with a Python bit-trick mirror, the sum merge law, the
relative-error guarantee, and exactness of the small-value singleton
buckets."""

import math

from recdb_postgresql_spark.functions import sketch

SCALE = 1_000_000
SUB_BITS = 3


def _py_bucket(v, scale=SCALE, sub_bits=SUB_BITS):
    q = int(round(v * scale))
    lvl = max(q.bit_length(), 1)  # bin(0) = '0' -> length 1
    shift = max(lvl - (sub_bits + 1), 0)
    return shift, q >> shift


def _py_sketch(vals):
    out = {}
    for v in vals:
        k = _py_bucket(v)
        out[k] = out.get(k, 0) + 1
    return out


def test_ddq_buckets_match_python_mirror(spark):
    vals = [0.0, 0.001, 0.03, 1.0, 7.5, 123.456, 99999.99]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {(r["shift"], r["sub"]): r["cnt"]
           for r in sketch.ddq_build(df, "v").collect()}
    assert got == _py_sketch(vals)


def test_ddq_merge_law(spark):
    a = spark.createDataFrame([(float(v),) for v in range(1, 500)], ["v"])
    b = spark.createDataFrame([(float(v),) for v in range(300, 900)], ["v"])
    merged = sketch.ddq_merge(sketch.ddq_build(a, "v"),
                              sketch.ddq_build(b, "v"))
    direct = sketch.ddq_build(a.unionByName(b), "v")
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, direct.collect()))


def test_ddq_relative_error_guarantee(spark):
    # log-spaced values spanning 5 decades; every estimated quantile
    # must sit within the advertised 2^-(sub_bits+1) relative error of
    # the true order statistic (plus nothing: these values are large
    # enough that the 1/scale quantization term vanishes).
    vals = sorted(math.exp(i / 40.0) for i in range(480))
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    sk = sketch.ddq_build(df, "v")
    ps = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = {r["p"]: r["est_value"]
           for r in sketch.ddq_quantiles(sk, ps).collect()}
    for p in ps:
        true = vals[max(math.ceil(p * len(vals)), 1) - 1]
        assert abs(est[p] / true - 1) <= 2 ** -(SUB_BITS + 1), \
            (p, est[p], true)


def test_ddq_small_values_exact(spark):
    # q < 2^(sub_bits+1) quantized units -> shift 0 -> singleton
    # buckets: the estimate IS the value (midpoint of [q, q+1) is
    # q + 0.5, within half a quantization unit).
    vals = [i / SCALE for i in range(16)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    sk = sketch.ddq_build(df, "v")
    rows = sketch.ddq_quantiles(sk, [0.5]).collect()
    # rank ceil(0.5*16) = 8 -> value 7/SCALE, midpoint 7.5/SCALE
    assert rows[0]["est_value"] == 7.5 / SCALE


def test_ddq_bucket_count_bounded(spark):
    df = spark.range(1, 200_000).selectExpr("CAST(id AS DOUBLE) / 7 AS v")
    n = sketch.ddq_build(df, "v").count()
    assert n < 512


def test_ddq_grouped_matches_ungrouped_per_group(spark):
    import math

    from pyspark.sql import functions as F
    vals = [("a", math.exp(i / 30.0)) for i in range(300)]
    vals += [("b", float(i + 1)) for i in range(500)]
    df = spark.createDataFrame(vals, ["g", "v"])
    grouped = sketch.ddq_quantiles_grouped(
        sketch.ddq_build_grouped(df, "g", "v"), [0.5, 0.9])
    got = {(r["grp"], r["p"]): r["est_value"]
           for r in grouped.collect()}
    for g in ("a", "b"):
        sub = df.where(F.col("g") == g)
        solo = {r["p"]: r["est_value"] for r in sketch.ddq_quantiles(
            sketch.ddq_build(sub, "v"), [0.5, 0.9]).collect()}
        assert got[(g, 0.5)] == solo[0.5]
        assert got[(g, 0.9)] == solo[0.9]


def test_ddq_grouped_merge_law(spark):
    a = spark.createDataFrame([("g", float(v)) for v in range(1, 400)],
                              ["g", "v"])
    b = spark.createDataFrame([("g", float(v)) for v in range(200, 900)],
                              ["g", "v"])
    from pyspark.sql import functions as F
    merged = (sketch.ddq_build_grouped(a, "g", "v")
              .unionByName(sketch.ddq_build_grouped(b, "g", "v"))
              .groupBy("grp", "shift", "sub")
              .agg(F.sum("cnt").alias("cnt")))
    direct = sketch.ddq_build_grouped(a.unionByName(b), "g", "v")
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, direct.collect()))


def test_silhouette_separated_vs_boundary(spark):
    from recdb_postgresql_spark.operators import similarity
    # two tight, well-separated clusters -> mean_sil near 1;
    # a smeared blob between two centroids -> near 0
    rows = []
    for i in range(20):
        rows.append((i, [10.0 + (i % 3) * 0.01, 0.1]))
        rows.append((100 + i, [0.1, 10.0 + (i % 3) * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [10.0, 0.1]), (1, [0.1, 10.0])],
        "cid int, cvec array<double>")
    out = {r["cid"]: r for r in
           similarity.silhouette_simplified(df, cents).collect()}
    assert out[0]["n"] == 20 and out[1]["n"] == 20
    assert out[0]["mean_sil"] > 0.9 and out[1]["mean_sil"] > 0.9
    # boundary points: equidistant from both centroids -> s ~ 0
    mid = spark.createDataFrame(
        [(i, [5.0, 5.0]) for i in range(10)],
        "vec_id long, embedding array<double>")
    m = similarity.silhouette_simplified(mid, cents).collect()
    assert all(abs(r["mean_sil"]) < 0.05 for r in m)
