"""Greedy MMR re-ranking: hand-checked selection, diversity effect,
determinism (the no-oracle pins for rec_mmr_rerank)."""

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators.similarity import mmr_rerank

CAND = "user long, item long, score double"
VEC = "vec_id long, embedding array<double>"


def _frames(spark):
    # items 1 and 2 are near-identical vectors with the best scores;
    # item 3 is orthogonal with a lower score
    cand = spark.createDataFrame(
        [(7, 1, 1.0), (7, 2, 0.95), (7, 3, 0.5)], CAND)
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.04]), (3, [0.0, 1.0])], VEC)
    return cand, vecs


def test_mmr_prefers_diverse_item_at_low_lambda(spark):
    cand, vecs = _frames(spark)
    rows = sorted(mmr_rerank(cand, vecs, k=2, lam=0.5).collect(),
                  key=lambda r: r.mmr_rank)
    # plain top-2 would be (1, 2); MMR swaps in the orthogonal item 3
    assert [(r.item, r.mmr_rank) for r in rows] == [(1, 1), (3, 2)]


def test_mmr_high_lambda_recovers_plain_topk(spark):
    cand, vecs = _frames(spark)
    rows = sorted(mmr_rerank(cand, vecs, k=3, lam=1.0).collect(),
                  key=lambda r: r.mmr_rank)
    assert [r.item for r in rows] == [1, 2, 3]  # pure score order


def test_mmr_first_pick_is_best_score_and_ranks_contiguous(spark):
    cand, vecs = _frames(spark)
    rows = sorted(mmr_rerank(cand, vecs, k=3, lam=0.3).collect(),
                  key=lambda r: r.mmr_rank)
    assert rows[0].item == 1
    assert [r.mmr_rank for r in rows] == [1, 2, 3]


def test_mmr_per_user_isolation_and_determinism(spark):
    cand, vecs = _frames(spark)
    two = cand.unionByName(
        cand.select((F.col("user") + 1).alias("user"), "item", "score"))
    a = {(r.user, r.item, r.mmr_rank)
         for r in mmr_rerank(two.repartition(7), vecs, k=2,
                             lam=0.5).collect()}
    b = {(r.user, r.item, r.mmr_rank)
         for r in mmr_rerank(two.repartition(2), vecs, k=2,
                             lam=0.5).collect()}
    assert a == b
    assert {u for u, _, _ in a} == {7, 8}
