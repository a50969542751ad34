"""Grid-bucketed spatial k-NN join (operators/geo.py): exactness
within the grid contract, and the no-cross-product plan shape."""

import random

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import geo


def _pts(spark, rows, schema="pid long, x double, y double"):
    return spark.createDataFrame(rows, schema)


def test_grid_knn_matches_bruteforce_when_cell_covers_space(spark):
    """With cell >= the space's extent, the 3x3 probe covers every
    point, so grid k-NN must equal exact brute-force k-NN."""
    rng = random.Random(11)
    rows = [(i, rng.uniform(0, 9.9), rng.uniform(0, 9.9))
            for i in range(60)]
    pts = _pts(spark, rows)
    qs = pts.where(F.col("pid") < 4).select(
        F.col("pid").alias("qid"), F.col("x").alias("qx"),
        F.col("y").alias("qy"))
    got = {(r.qid, r.rank): r.pid
           for r in geo.grid_knn_join(pts, qs, k=3, cell=10.0).collect()}
    brute = {}
    for qid, qx, qy in ((r.pid, r.x, r.y) for r in pts.collect()
                        if r.pid < 4):
        ds = sorted((round((x - qx) ** 2 + (y - qy) ** 2, 6), pid)
                    for pid, x, y in rows if pid != qid)
        for rank, (d, pid) in enumerate(ds[:3], 1):
            brute[(qid, rank)] = pid
    assert got == brute


def test_grid_contract_finds_all_within_cell_radius(spark):
    """Every point within `cell` distance of a query MUST appear among
    its candidates (rank holds under k=large), even across cell
    boundaries."""
    rows = [(1, 0.95, 0.95), (2, 1.05, 1.05),    # straddle cell corner
            (3, 0.05, 0.05), (4, 1.95, 1.95)]
    pts = _pts(spark, rows)
    qs = _pts(spark, [(1, 0.95, 0.95)], "qid long, qx double, qy double")
    got = {r.pid for r in geo.grid_knn_join(pts, qs, k=10, cell=1.0).collect()}
    assert {2, 3, 4} <= got                      # all within sqrt(2) <= ... found


def test_grid_knn_plan_has_no_cross_product(spark):
    from recdb_postgresql_spark.sources.readers import load_table
    import __spark_entry__ as entrymod

    df = entrymod.queries()["geo_knn_join"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


import pytest


@pytest.mark.parametrize("radius,seed", [(4.0, 23), (1.7, 31)])
def test_grid_range_join_exact_vs_bruteforce(spark, radius, seed):
    """Range join is EXACT (cell = radius): equals the brute-force
    radius filter on random points, including cross-cell neighbors.
    Two radii — the cell cover must be exact regardless of how the
    radius tiles the point cloud (a cell-boundary bug at one radius
    can be invisible at another)."""
    rng = random.Random(seed)
    rows = [(i, rng.uniform(0, 30), rng.uniform(0, 30)) for i in range(80)]
    pts = _pts(spark, rows)
    qs = pts.where(F.col("pid") < 5).select(
        F.col("pid").alias("qid"), F.col("x").alias("qx"),
        F.col("y").alias("qy"))
    got = {(r.qid, r.pid) for r in
           geo.grid_range_join(pts, qs, radius=radius).collect()}
    brute = {(qid, pid)
             for qid, qx, qy in ((r.pid, r.x, r.y) for r in pts.collect()
                                 if r.pid < 5)
             for pid, x, y in rows
             if pid != qid
             and round((x - qx) ** 2 + (y - qy) ** 2, 6) <= radius * radius}
    assert got == brute and got


def test_dbscan_blobs_borders_and_noise(spark):
    from recdb_postgresql_spark.operators.geo import grid_dbscan

    # two 5x2 dense blobs (spacing 0.3), a border point hanging 1.0
    # off blob 1's corner, and two isolated noise points
    rows, pid = [], 0
    for bx, by in ((0.0, 0.0), (50.0, 50.0)):
        for i in range(10):
            rows.append((pid, bx + (i % 5) * 0.3, by + (i // 5) * 0.3))
            pid += 1
    rows += [(90, 1.2 + 1.4, 0.0)]   # reaches 2 cores: border, not core
    rows += [(100, 25.0, 25.0), (101, 80.0, 10.0)]
    df = spark.createDataFrame(rows, ["pid", "x", "y"])
    out = {r["pid"]: r for r in
           grid_dbscan(df, eps=1.5, min_pts=4).collect()}
    assert {out[i]["cluster"] for i in range(10)} == {0}
    assert {out[i]["cluster"] for i in range(10, 20)} == {10}
    assert all(out[i]["role"] == "core" for i in range(20))
    assert out[100]["role"] == "noise" and out[100]["cluster"] is None
    assert out[101]["role"] == "noise"
    # the hanger-on: within eps of cores but with too few neighbors
    assert out[90]["role"] == "border" and out[90]["cluster"] == 0
    # determinism across partitionings
    out2 = {r["pid"]: (r["role"], r["cluster"]) for r in
            grid_dbscan(df.repartition(7), eps=1.5, min_pts=4).collect()}
    assert out2 == {k: (v["role"], v["cluster"]) for k, v in out.items()}
