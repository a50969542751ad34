"""Spatial joins — the grid-bucketed k-NN/range pattern.

The reference ships a location dataset with no consuming operator
(``PostgreSQL/GeoSocial/venues.dat`` — id;lat;lon rows, an orphaned
asset: no recathon code reads it). This module is the Spark-first
counterpart a location-aware recommender (LARS-style) would need, and
the second member of the "joins Spark expresses badly" family next to
``temporal.asof_join``: a naive distance join is an inequality join
(``dist(p, q) <= r``), which Catalyst can only nested-loop — fatal at
scale.

The scalable shape is GRID BUCKETING (the integer-cell form of a
geohash index): snap every point to a cell of side ``cell``; a query
fans out to its 3x3 neighbor cells and equi-joins on the cell id, so
candidate volume is O(points in 9 cells), never |P| x |Q|. Standard
guarantee: every neighbor within ``cell`` distance is found
(a radius-r query needs cell >= r); distant same-cell stragglers are
scored and ranked out, never wrongly dropped.

Distances here are squared planar deltas — pure arithmetic, so the
operator value-hash-checks against a SQL oracle (haversine's libm
trig is last-ulp engine-dependent; at city scale the planar error is
irrelevant and a production variant would swap the distance lambda).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_grid_cell(df: DataFrame, x_col: str, y_col: str,
                   cell: float) -> DataFrame:
    """Append integer grid coordinates (cx, cy): floor(coord / cell).
    One narrow projection — the write-side of a spatial layout (pair
    with ``sinks.write_bucketed`` on (cx, cy) or partitionBy for a
    persisted spatial index, exactly like ``similarity.write_ivf_index``)."""
    return df.withColumn("cx", F.floor(F.col(x_col) / cell).cast("long")) \
             .withColumn("cy", F.floor(F.col(y_col) / cell).cast("long"))


def _grid_candidates(points: DataFrame, queries: DataFrame, cell: float,
                     id_col: str, x_col: str, y_col: str,
                     qid_col: str, qx_col: str, qy_col: str,
                     round_to: int) -> DataFrame:
    """Shared candidate generator for the grid joins: snap both sides
    to ``cell``-sized cells, fan each query out to its 3x3 neighbor
    cells (a broadcast — queries are the small side), equi-join on the
    cell id, and score squared planar distance. Returns
    (qid, <id_col>, dist2) for every candidate in the 9-cell cover —
    candidate volume is O(|Q| x density x 9 cells), never |P| x |Q|,
    and the plan has no inequality join or cross product."""
    p = with_grid_cell(points, x_col, y_col, cell)
    q = with_grid_cell(queries, qx_col, qy_col, cell)
    probes = (q.select(qid_col, qx_col, qy_col, "cx", "cy")
              .withColumn("dx", F.explode(F.expr("sequence(-1, 1)")))
              .withColumn("dy", F.explode(F.expr("sequence(-1, 1)")))
              .select(qid_col, qx_col, qy_col,
                      (F.col("cx") + F.col("dx")).alias("pcx"),
                      (F.col("cy") + F.col("dy")).alias("pcy")))
    cand = (p.join(F.broadcast(probes),
                   (F.col("cx") == F.col("pcx"))
                   & (F.col("cy") == F.col("pcy")))
            .where(F.col(id_col) != F.col(qid_col)))
    d2 = ((F.col(x_col) - F.col(qx_col)) * (F.col(x_col) - F.col(qx_col))
          + (F.col(y_col) - F.col(qy_col)) * (F.col(y_col) - F.col(qy_col)))
    return cand.select(F.col(qid_col).alias("qid"), F.col(id_col),
                       F.round(d2, round_to).alias("dist2"))


def grid_range_join(points: DataFrame, queries: DataFrame, radius: float,
                    id_col: str = "pid", x_col: str = "x", y_col: str = "y",
                    qid_col: str = "qid", qx_col: str = "qx",
                    qy_col: str = "qy", round_to: int = 6) -> DataFrame:
    """(qid, pid, dist2): ALL points within ``radius`` of each query —
    the literal range join, grid-bucketed so the inequality predicate
    only ever filters within 3x3 neighbor cells (cell side = radius,
    which makes the neighbor-cell cover exact: any point within
    ``radius`` is at most one cell away on each axis). EXACT, unlike
    k-NN's grid contract — the cell size is derived from the radius."""
    scored = _grid_candidates(points, queries, radius, id_col, x_col,
                              y_col, qid_col, qx_col, qy_col, round_to)
    return scored.where(F.col("dist2") <= radius * radius)


def grid_knn_join(points: DataFrame, queries: DataFrame, k: int = 5,
                  cell: float = 1.0,
                  id_col: str = "pid", x_col: str = "x", y_col: str = "y",
                  qid_col: str = "qid", qx_col: str = "qx",
                  qy_col: str = "qy", round_to: int = 6) -> DataFrame:
    """(qid, pid, dist2, rank<=k): each query's k nearest points by
    squared planar distance among candidates in its 3x3 neighbor
    cells. Exact for any neighbor within ``cell`` distance; beyond
    that the grid contract applies (raise ``cell`` or probe wider).

    Plan shape: points get a cell id (narrow map); each query expands
    to 9 (cell, query) probe rows — a broadcast, queries are the small
    side — and the candidate join is a pure equi-join on (cx, cy).
    No inequality join, no cross product (plan-pinned). Ties break on
    pid for determinism."""
    scored = _grid_candidates(points, queries, cell, id_col, x_col,
                              y_col, qid_col, qx_col, qy_col, round_to)
    w = Window.partitionBy("qid").orderBy("dist2", id_col)
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def grid_dbscan(points: DataFrame, eps: float, min_pts: int,
                id_col: str = "pid", x_col: str = "x",
                y_col: str = "y") -> DataFrame:
    """DBSCAN density clustering, grid-blocked: (id, role, cluster)
    with role in {'core', 'border', 'noise'} and cluster = the MIN
    core id reachable through core-core eps-edges (canonical labels —
    no scan-order dependence, unlike textbook DBSCAN's border
    assignment; borders take the smallest adjacent core cluster).

    Candidate pairs come from the 3x3 neighbor-cell cover with cell
    side = eps (exact: any eps-neighbor is at most one cell away per
    axis), as a plain cell equi-join — the classic all-pairs distance
    matrix never exists, and density (points per cell) bounds every
    task. Neighbor counts cap at min_pts conceptually; components run
    only over CORE-core edges (dedup.connected_components — union-
    find / label-prop / star escalation by graph size). A core point
    with no core neighbor keeps its own id as the cluster label.

    Scale shape: one cell snap (map), one self equi-join on (cx, cy),
    one degree aggregate, CC over the (much smaller) core-edge graph,
    one broadcast-size join back for borders. eps is the density knob:
    it bounds rows-per-cell, hence per-task pair volume.
    """
    from recdb_postgresql_spark.operators.dedup import connected_components

    p = with_grid_cell(points.select(F.col(id_col).alias("pid"),
                                     F.col(x_col).alias("x"),
                                     F.col(y_col).alias("y")),
                       "x", "y", eps)
    probe = (p.withColumn("dx", F.explode(F.expr("sequence(-1, 1)")))
             .withColumn("dy", F.explode(F.expr("sequence(-1, 1)")))
             .select(F.col("pid").alias("pa"), F.col("x").alias("xa"),
                     F.col("y").alias("ya"),
                     (F.col("cx") + F.col("dx")).alias("ncx"),
                     (F.col("cy") + F.col("dy")).alias("ncy")))
    d2 = ((F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x"))
          + (F.col("ya") - F.col("y")) * (F.col("ya") - F.col("y")))
    # the neighbor-pair list (the expensive 3x3-cell equi-join +
    # distance filter) feeds the degree aggregate, the core-edge
    # derivation and the border assignment — materialized once, it is
    # eps-neighbor-pair-sized (tiny next to the points); ditto the
    # core set, consumed by three further legs (r12 plan audit:
    # uncheckpointed, the cell join re-executed per leg)
    pairs = (probe.join(p, (F.col("ncx") == F.col("cx"))
                        & (F.col("ncy") == F.col("cy")))
             .where(F.col("pa") != F.col("pid"))
             .where(d2 <= F.lit(eps * eps))
             .select("pa", F.col("pid").alias("pb"))
             .localCheckpoint(eager=True))
    deg = pairs.groupBy("pa").agg(F.count(F.lit(1)).alias("nb"))
    core = (deg.where(F.col("nb") + 1 >= min_pts)
            .select(F.col("pa").alias("pid"))
            .localCheckpoint(eager=True))
    ce = (pairs.join(core.withColumnRenamed("pid", "pa"), "pa")
          .join(core.withColumnRenamed("pid", "pb"), "pb")
          .select(F.col("pa").alias("id1"), F.col("pb").alias("id2")))
    comp = connected_components(ce)  # (id, component)
    core_lab = (core.join(comp, core["pid"] == comp["id"], "left")
                .select("pid", F.coalesce("component", "pid")
                        .alias("cluster")))
    border = (pairs.join(core_lab.withColumnRenamed("pid", "pb"), "pb")
              .join(core.withColumnRenamed("pid", "pa"), "pa",
                    "left_anti")
              .groupBy(F.col("pa").alias("pid"))
              .agg(F.min("cluster").alias("cluster")))
    labeled = (core_lab.select("pid", F.lit("core").alias("role"),
                               "cluster")
               .unionByName(border.select(
                   "pid", F.lit("border").alias("role"), "cluster")))
    noise = (p.select("pid").join(labeled.select("pid"), "pid",
                                  "left_anti")
             .select("pid", F.lit("noise").alias("role"),
                     F.lit(None).cast(labeled.schema["cluster"].dataType)
                     .alias("cluster")))
    return labeled.unionByName(noise).orderBy("pid")
