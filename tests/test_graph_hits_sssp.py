"""HITS and weighted Bellman-Ford SSSP (operators/graph.py):
hand-built graphs with known fixed points / shortest paths."""

import pytest

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import graph


def _edges(spark, pairs, weights=None):
    if weights is None:
        return spark.createDataFrame(pairs, ["id1", "id2"])
    rows = [(u, v, w) for (u, v), w in zip(pairs, weights)]
    return spark.createDataFrame(rows, ["id1", "id2", "w"])


def test_hits_star_authority(spark):
    # 1..4 all point at 5: node 5 is the only authority, 1..4 are
    # equal hubs, and the L1 norms are 1
    e = _edges(spark, [(1, 5), (2, 5), (3, 5), (4, 5)])
    out = {r["id"]: r for r in graph.hits(e, iterations=4).collect()}
    assert out[5]["authority"] == pytest.approx(1.0)
    assert out[5]["hub"] == 0.0
    for n in (1, 2, 3, 4):
        assert out[n]["authority"] == 0.0
        assert out[n]["hub"] == pytest.approx(0.25)
    assert sum(r["authority"] for r in out.values()) == pytest.approx(1.0, abs=1e-5)
    assert sum(r["hub"] for r in out.values()) == pytest.approx(1.0, abs=1e-5)


def test_hits_chain_vs_manual(spark):
    # 1->2->3 plus 1->3: manual two-iteration fixed point check that
    # node 3 (two in-edges, one from the strong hub 1) out-ranks 2
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    out = {r["id"]: r for r in graph.hits(e, iterations=6).collect()}
    assert out[3]["authority"] > out[2]["authority"] > out[1]["authority"]
    assert out[1]["hub"] > out[2]["hub"] > out[3]["hub"]


def test_sssp_picks_cheaper_two_hop(spark):
    # direct edge 1->3 costs 10; the 1->2->3 detour costs 3
    e = _edges(spark, [(1, 3), (1, 2), (2, 3)], [10.0, 1.0, 2.0])
    src = spark.createDataFrame([(1,)], ["id"])
    out = {r["id"]: r["dist"] for r in graph.sssp(e, src, rounds=4).collect()}
    assert out == {1: 0.0, 2: 1.0, 3: 3.0}


def test_sssp_round_truncation(spark):
    # a 4-edge chain: with rounds=2 only two hops are reachable
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)],
               [1.0, 1.0, 1.0, 1.0])
    src = spark.createDataFrame([(1,)], ["id"])
    out = {r["id"]: r["dist"] for r in graph.sssp(e, src, rounds=2).collect()}
    assert out == {1: 0.0, 2: 1.0, 3: 2.0}


def test_sssp_multi_source_and_undirected(spark):
    e = _edges(spark, [(1, 2), (4, 3)], [5.0, 1.0])
    src = spark.createDataFrame([(2,), (3,)], ["id"])
    out = {r["id"]: r["dist"] for r in
           graph.sssp(e, src, rounds=3, directed=False).collect()}
    # undirected: 1 reachable from 2 (w=5), 4 from 3 (w=1)
    assert out == {2: 0.0, 3: 0.0, 1: 5.0, 4: 1.0}
    # directed: neither 1 nor 4 is reachable (edges point INTO the sources)
    out_d = {r["id"]: r["dist"] for r in
             graph.sssp(e, src, rounds=3, directed=True).collect()}
    assert out_d == {2: 0.0, 3: 0.0}


def test_sssp_parallel_edges_keep_min(spark):
    # duplicate (1,2) edges with different weights: the lighter wins
    e = _edges(spark, [(1, 2), (1, 2)], [7.0, 3.0])
    src = spark.createDataFrame([(1,)], ["id"])
    out = {r["id"]: r["dist"] for r in graph.sssp(e, src, rounds=1).collect()}
    assert out == {1: 0.0, 2: 3.0}


def test_kcore_clique_survives_pendants_peel(spark):
    from recdb_postgresql_spark.operators.graph import kcore
    # K4 clique (1-4) + pendant chain 4-5-6 + isolated pair (7,8)
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                       (4, 5), (5, 6), (7, 8)])
    out = {r["id"]: r["deg"] for r in kcore(e, k=3, rounds=6).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}    # chain + pair peel fully
    out2 = {r["id"]: r["deg"] for r in kcore(e, k=2, rounds=6).collect()}
    assert set(out2) == {1, 2, 3, 4}          # 2-core: the cycle only
    # the pendant CASCADE: 6 peels first, then 5 — two rounds needed
    out_short = {r["id"] for r in kcore(e, k=2, rounds=1).collect()}
    assert 5 in out_short and 6 not in out_short


def test_kcore_empty_when_overdemanding(spark):
    from recdb_postgresql_spark.operators.graph import kcore
    e = _edges(spark, [(1, 2), (2, 3)])
    assert kcore(e, k=5, rounds=3).count() == 0


def test_assortativity_star_vs_clique(spark):
    from recdb_postgresql_spark.operators.graph import degree_assortativity

    # star: hub-to-leaf only -> strongly negative (exactly -1 for a
    # pure star: endpoint degrees are perfectly anti-correlated)
    star = spark.createDataFrame([(0, i) for i in range(1, 9)],
                                 ["id1", "id2"])
    r = degree_assortativity(star).collect()[0]
    assert r["n_edges"] == 8 and r["assortativity"] == -1.0
    # clique: all degrees equal -> correlation undefined (zero
    # variance) -> NULL via try_divide, never a crash
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        ["id1", "id2"])
    r2 = degree_assortativity(k4).collect()[0]
    assert r2["n_edges"] == 6 and r2["assortativity"] is None
    # two cliques joined by a bridge: mixed degrees, finite value
    edges = ([(a, b) for a in range(4) for b in range(a + 1, 4)]
             + [(10 + a, 10 + b) for a in range(4)
                for b in range(a + 1, 4)] + [(0, 10)])
    r3 = degree_assortativity(
        spark.createDataFrame(edges, ["id1", "id2"])).collect()[0]
    assert r3["assortativity"] is not None
    assert -1.0 <= r3["assortativity"] <= 1.0


def test_clustering_coefficient_clique_and_bridge(spark):
    from recdb_postgresql_spark.operators.graph import (
        clustering_coefficient)

    # K4 + a pendant node hanging off node 0
    edges = ([(a, b) for a in range(4) for b in range(a + 1, 4)]
             + [(0, 9)])
    out = {r["id"]: r for r in clustering_coefficient(
        spark.createDataFrame(edges, ["id1", "id2"])).collect()}
    # interior clique nodes: every neighbor pair connected -> 1.0
    assert out[1]["clustering"] == 1.0 and out[1]["degree"] == 3
    # node 0 gained a pendant neighbor: 3 triangles of C(4,2)=6 pairs
    assert out[0]["degree"] == 4 and out[0]["clustering"] == 0.5
    # pendant: degree 1 -> undefined (NULL), zero triangles
    assert out[9]["clustering"] is None and out[9]["n_triangles"] == 0


def test_modularity_cliques_vs_trivial(spark):
    from recdb_postgresql_spark.operators import graph
    # two 5-cliques joined by one bridge edge
    edges = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((0, 10))
    e = spark.createDataFrame(edges, ["id1", "id2"])
    good = spark.createDataFrame(
        [(i, i // 10) for i in list(range(5)) + list(range(10, 15))],
        ["id", "community"])
    q_good = graph.modularity(e, good).collect()[0]
    assert q_good["n_communities"] == 2 and q_good["m_edges"] == 21
    assert q_good["modularity"] > 0.4
    trivial = good.selectExpr("id", "0 AS community")
    q_triv = graph.modularity(e, trivial).collect()[0]
    assert abs(q_triv["modularity"]) < 1e-9
    assert q_good["modularity"] > q_triv["modularity"]


def test_modularity_probe_matches_in_query(spark):
    """graph_modularity_probe (persisted edges+labels) must return the
    SAME single row as the in-query rebuild — the probe is only
    'graph_modularity amortized' while they never diverge."""
    import __spark_entry__ as entrymod
    sf = "/root/testdata/sf0.001"
    full = entrymod.queries()["graph_modularity"](spark, sf).collect()
    probe = entrymod.queries()["graph_modularity_probe"](spark, sf).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in probe]
