"""Degenerate-input behavior: empty events, constant ratings, single
user/item — the engine must return well-defined empties/zeros, never
crash or emit NaN (the reference warns and skips instead —
recathon.c:3893-3898)."""

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.engine import RecEngine
from recdb_postgresql_spark.operators import cf

SCHEMA = "userid long, itemid long, ratingval double"


def test_empty_events_recommend(spark):
    empty = spark.createDataFrame([], SCHEMA)
    out = RecEngine(spark).recommend(empty, "userid", "itemid", "ratingval",
                                     "itemcoscf", k=5)
    assert out.count() == 0


def test_constant_ratings_pearson_all_zero(spark):
    # identical ratings everywhere -> centered values all 0 -> p = 0
    # for every item -> empty model -> every prediction scores 0
    rows = [(u, i, 3.0) for u in range(1, 4) for i in range(1, 4)]
    events = spark.createDataFrame(rows, SCHEMA)
    out = RecEngine(spark).recommend(events, "userid", "itemid", "ratingval",
                                     "itempearcf")
    vals = [r.ratingval for r in out.collect()]
    assert len(vals) == 9
    assert all(v == 0.0 for v in vals)
    assert not any(v != v for v in vals)  # no NaN


def test_single_user_item_cos(spark):
    events = spark.createDataFrame([(1, 10, 4.0), (1, 20, 5.0)], SCHEMA)
    out = RecEngine(spark).recommend(events, "userid", "itemid", "ratingval",
                                     "itemcoscf")
    scored = {(r.userid, r.itemid): r.ratingval for r in out.collect()}
    # one co-rating user -> sim(10,20)=1 -> each item predicted from the other
    assert scored[(1, 10)] == pytest.approx(5.0)
    assert scored[(1, 20)] == pytest.approx(4.0)


def test_single_rating_user_cf_no_nan(spark):
    # a user with exactly 1 rating and an item rated by exactly 1 user
    # (FIXTURES.md degenerate-denominator cases)
    rows = [(1, 10, 4.0), (2, 10, 2.0), (3, 99, 5.0)]
    events = spark.createDataFrame(rows, SCHEMA)
    out = RecEngine(spark).recommend(events, "userid", "itemid", "ratingval",
                                     "usercoscf")
    vals = out.collect()
    assert len(vals) == 6  # 3 users x 2 items
    assert all(r.ratingval == r.ratingval for r in vals)  # no NaN


def test_user_where_matching_nobody(spark):
    events = spark.createDataFrame([(1, 10, 4.0), (2, 20, 3.0)], SCHEMA)
    out = RecEngine(spark).recommend(events, "userid", "itemid", "ratingval",
                                     "itemcoscf", user_where=F.col("userid") > 100)
    assert out.count() == 0


def test_normalize_drops_nulls(spark):
    events = spark.createDataFrame(
        [(1, 10, 4.0), (None, 10, 2.0), (2, None, 3.0), (3, 30, None)],
        SCHEMA)
    r = cf.normalize_events(events, "userid", "itemid", "ratingval")
    assert r.count() == 1


def test_lsh_verified_subset_of_exact(spark):
    """Invariant: the LSH-verified flow returns a SUBSET of the exact
    Jaccard pairs (candidates can only lose recall, never add pairs or
    change a surviving pair's score)."""
    from recdb_postgresql_spark.operators import dedup

    rows = [(i, f"common base text tokens {'x' * (i % 3)} tail {i % 5}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.word_shingles(docs)
    exact = {(r.id1, r.id2): round(r.jaccard, 9)
             for r in dedup.jaccard_pairs(sh, threshold=0.3).collect()}
    verified = {(r.id1, r.id2): round(r.jaccard, 9)
                for r in dedup.lsh_verified_pairs(sh, threshold=0.3,
                                                  num_hashes=8, bands=4,
                                                  rows_per_band=2).collect()}
    assert set(verified) <= set(exact)
    for k, v in verified.items():
        assert exact[k] == v                      # identical scores


def test_connected_components_long_chain_escalates(spark):
    """A chain longer than max_iters propagation rounds escalates to
    the O(log n) star algorithm instead of raising (VERDICT r3 #3) —
    silently-split clusters (ADVICE r1) stay impossible either way."""
    from recdb_postgresql_spark.operators import dedup

    chain = [(i, i + 1) for i in range(25)]       # diameter 25 > 20
    pairs = spark.createDataFrame(chain, "id1 long, id2 long")
    comp = dedup.connected_components(pairs, max_iters=2,
                                      local_threshold=0).collect()
    assert {r.component for r in comp} == {0}
    assert len(comp) == 26
    # and converges fine within propagation rounds too: same answer
    comp = dedup.connected_components(pairs, max_iters=30,
                                      local_threshold=0).collect()
    assert {r.component for r in comp} == {0}


def test_star_components_matches_propagation(spark):
    """Large-star/small-star agrees with label propagation on a mixed
    graph (chains + cliques + isolated pair), including component ids
    (= min id per component)."""
    import random

    from recdb_postgresql_spark.operators import dedup

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(40)]            # long chain 0..40
    edges += [(100 + a, 100 + b) for a in range(6) for b in range(a)]
    edges += [(200, 201)]
    edges += [(rng.randrange(300, 330), rng.randrange(300, 330))
              for _ in range(40)]
    edges = [(a, b) if a < b else (b, a) for a, b in edges if a != b]
    pairs = spark.createDataFrame(sorted(set(edges)), "id1 long, id2 long")
    star = {r.id: r.component
            for r in dedup.connected_components_star(pairs).collect()}
    prop = {r.id: r.component
            for r in dedup.connected_components(pairs, max_iters=50,
                                                local_threshold=0).collect()}
    local = {r.id: r.component
             for r in dedup.connected_components(pairs).collect()}
    assert star == prop
    assert local == prop      # union-find fast path: same map


def test_jaccard_with_empty_candidates(spark):
    from recdb_postgresql_spark.operators import dedup

    docs = spark.createDataFrame([(1, "a b c d"), (2, "a b c e")],
                                 "doc_id long, text string")
    sh = dedup.word_shingles(docs)
    empty = spark.createDataFrame([], "id1 long, id2 long")
    out = dedup.jaccard_pairs(sh, threshold=0.1, candidates=empty)
    assert out.count() == 0


def test_star_components_trivial_graphs(spark):
    """Star CC edges: empty pair set -> empty result; single pair ->
    one two-node component labeled by the min id."""
    from recdb_postgresql_spark.operators import dedup

    empty = spark.createDataFrame([], "id1 long, id2 long")
    assert dedup.connected_components_star(empty).count() == 0
    one = spark.createDataFrame([(7, 3)], "id1 long, id2 long")
    got = {(r.id, r.component)
           for r in dedup.connected_components_star(one).collect()}
    assert got == {(3, 3), (7, 3)}


def test_round7_operators_handle_empty_inputs(spark):
    """Every round-7 operator must return an empty frame (not raise)
    on empty inputs — the first batch of a streaming backfill or an
    over-filtered corpus IS empty."""
    from pyspark.sql import functions as F

    from recdb_postgresql_spark.functions import sampling
    from recdb_postgresql_spark.operators import dedup, graph, text

    edges = spark.createDataFrame([], "id1 long, id2 long")
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert graph.pagerank(edges).count() == 0
    assert graph.triangle_count(edges).count() == 0
    assert dedup.prefix_filtered_pairs(
        dedup.word_shingles(docs)).count() == 0
    assert text.strip_common_spans(docs).count() == 0
    assert text.lm_perplexity(docs).count() == 0
    assert text.bm25_topk(docs, ["x"]).count() == 0
    assert text.importance_weights(docs, docs).count() == 0
    assert sampling.weighted_sample(
        docs, F.lit(1.0), F.col("doc_id"), 5).count() == 0


def test_round8_operators_handle_empty_inputs(spark):
    """Same contract for this round's operators: empty in, empty (or
    pass-through) out — never a crash."""
    from recdb_postgresql_spark.operators import text
    from recdb_postgresql_spark.operators.dml import merge_into
    from recdb_postgresql_spark.operators.graph import bfs_distances
    from recdb_postgresql_spark.operators.linkage import edit_distance_join
    from recdb_postgresql_spark.operators.profile import profile_drift
    from recdb_postgresql_spark.operators.similarity import (knn_classify,
                                                             mmr_rerank)
    from recdb_postgresql_spark.operators.temporal import scd2_build

    t_schema = "k long, name string, v double"
    empty_t = spark.createDataFrame([], t_schema)
    one_t = spark.createDataFrame([(1, "a", 1.0)], t_schema)
    # empty source -> target unchanged; empty target -> pure inserts
    assert merge_into(one_t, empty_t, ["k"]).count() == 1
    assert merge_into(empty_t, one_t, ["k"]).count() == 1
    assert merge_into(empty_t, empty_t, ["k"]).count() == 0

    changes = spark.createDataFrame([], "u long, ts long, s string")
    assert scd2_build(changes, ["u"], "ts", ["s"]).count() == 0

    names = spark.createDataFrame([], "id long, name string")
    for strategy in ("deletion", "prefix"):
        assert edit_distance_join(names, strategy=strategy).count() == 0

    edges = spark.createDataFrame([], "id1 long, id2 long")
    srcs = spark.createDataFrame([], "id long")
    assert bfs_distances(edges, srcs).count() == 0
    # sources with NO edges still report themselves at dist 0
    one_src = spark.createDataFrame([(7,)], "id long")
    rows = bfs_distances(edges, one_src).collect()
    assert [(r.id, r.dist) for r in rows] == [(7, 0)]

    lab = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label int")
    q = spark.createDataFrame([], "qid long, qvec array<double>")
    assert knn_classify(lab, q).count() == 0
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    cand = spark.createDataFrame([], "user long, item long, score double")
    assert mmr_rerank(cand, emb).count() == 0

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert text.fts_match(docs, all_of=("x",)).count() == 0
    # profile_drift on empty sides: stats rows exist (counts are 0)
    d = profile_drift(spark.createDataFrame([], "value double"),
                      spark.createDataFrame([], "value double"),
                      ["value"], quantiles=(0.5,))
    stats = {r.stat: (r.old_value, r.new_value) for r in d.collect()}
    assert stats["n_rows"] == (0.0, 0.0)


def test_bfs_directed_respects_edge_direction(spark):
    from recdb_postgresql_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 1)],
                                  "id1 long, id2 long")
    srcs = spark.createDataFrame([(1,)], "id long")
    directed = {(r.id, r.dist) for r in
                bfs_distances(edges, srcs, directed=True).collect()}
    # 4 -> 1 is inbound only: unreachable when directed
    assert directed == {(1, 0), (2, 1), (3, 2)}
    undirected = {(r.id, r.dist) for r in
                  bfs_distances(edges, srcs).collect()}
    assert undirected == {(1, 0), (2, 1), (4, 1), (3, 2)}
