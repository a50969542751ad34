"""Product Quantization: determinism, compression shape, ADC fidelity
on planted duplicates — the no-oracle pins for ann_pq_topk."""

import numpy as np
from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import similarity
from recdb_postgresql_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _unit(spark):
    emb = load_table(spark, SF, "embeddings")
    return similarity.unit_normalize(emb).withColumnRenamed("unit", "uv")


def test_pq_codes_shape_and_determinism(spark):
    unit = _unit(spark)
    b1 = similarity.pq_train(unit, m=8, k=32, vec_col="uv",
                             sample=1024, iters=3)
    b2 = similarity.pq_train(unit.repartition(7), m=8, k=32,
                             vec_col="uv", sample=1024, iters=3)
    # hash-ordered sample + RNG-free Lloyd -> identical codebooks
    np.testing.assert_allclose(b1, b2)
    codes = similarity.pq_encode(unit, b1, vec_col="uv")
    rows = codes.limit(5).collect()
    assert all(len(r.codes) == 8 for r in rows)
    assert all(0 <= c < 32 for r in rows for c in r.codes)


def test_pq_identical_vectors_get_identical_codes(spark):
    unit = _unit(spark)
    dup = unit.limit(10)
    both = unit.unionByName(
        dup.select((F.col("vec_id") + 100000).alias("vec_id"), "uv"))
    books = similarity.pq_train(unit, m=8, k=32, vec_col="uv",
                                sample=1024, iters=3)
    codes = {r.vec_id: tuple(r.codes)
             for r in similarity.pq_encode(both, books,
                                           vec_col="uv").collect()}
    for r in dup.collect():
        assert codes[r.vec_id] == codes[r.vec_id + 100000]


def test_pq_adc_finds_planted_duplicate_at_rank_one(spark):
    """A verbatim copy of the query vector must be the ADC top-1:
    identical vectors share codes, so their ADC score is the maximal
    self-score — the recall property compression must not break."""
    unit = _unit(spark)
    q_src = unit.where(F.col("vec_id") == 3)
    planted = q_src.select(F.lit(99999).alias("vec_id"), "uv")
    corpus = unit.unionByName(planted)
    books = similarity.pq_train(unit, m=8, k=32, vec_col="uv",
                                sample=1024, iters=3)
    codes = similarity.pq_encode(corpus, books, vec_col="uv")
    q = q_src.select(F.col("vec_id").alias("qid"),
                     F.col("uv").alias("qvec"))
    top = similarity.pq_topk(codes, books, q, k=5).collect()
    best = min(top, key=lambda r: r.rank)
    assert best.vec_id == 99999


def test_pq_adc_approximates_true_dot(spark):
    """ADC score vs the exact dot product on the same normalized
    vectors: mean absolute error well under the score scale (the
    quantization-error bound a 32x compression buys here)."""
    unit = _unit(spark)
    books = similarity.pq_train(unit, m=8, k=64, vec_col="uv",
                                sample=2048, iters=5)
    codes = similarity.pq_encode(unit, books, vec_col="uv")
    q = unit.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("uv").alias("qvec"))
    adc = {r.vec_id: r.score
           for r in similarity.pq_topk(codes, books, q, k=50).collect()}
    exact = {r.vec_id: r.cos
             for r in similarity.brute_force_topk(
                 unit, q, k=500, vec_col="uv").collect()}
    errs = [abs(adc[v] - exact[v]) for v in adc if v in exact]
    assert errs and sum(errs) / len(errs) < 0.15


def test_ivfpq_candidates_subset_and_recall_of_planted(spark):
    """IVF-PQ returns a subset of PQ's candidates (pruning, never
    adding), and a verbatim planted duplicate sharing the query's cell
    still surfaces at rank 1 through BOTH stages."""
    unit = _unit(spark)
    q_src = unit.where(F.col("vec_id") == 3)
    planted = q_src.select(F.lit(99999).alias("vec_id"), "uv")
    corpus = unit.unionByName(planted)
    cent = similarity.first_k_centroids(unit, k=8, vec_col="uv")
    books = similarity.pq_train(unit, m=8, k=32, vec_col="uv",
                                sample=1024, iters=3)
    codes = similarity.pq_encode(corpus, books, vec_col="uv")
    assign = similarity.ivf_assign(corpus, cent, vec_col="uv")
    q = q_src.select(F.col("vec_id").alias("qid"),
                     F.col("uv").alias("qvec"))
    probed = similarity.ivf_assign(
        q.select(F.col("qid").alias("vec_id"),
                 F.col("qvec").alias("uv")),
        cent, vec_col="uv", n=2).select("cell").distinct()
    cand = codes.join(assign, "vec_id") \
        .join(F.broadcast(probed), "cell").select("vec_id", "codes")
    assert cand.count() < corpus.count()  # pruning really happened
    top = similarity.pq_topk(cand, books, q, k=5).collect()
    assert min(top, key=lambda r: r.rank).vec_id == 99999


def test_pq_topk_multiple_queries_batched(spark):
    """The ADC scorer must handle Arrow batches interleaving several
    queries (the replicating crossJoin mixes them): per-query top-k
    matches the single-query runs exactly."""
    unit = _unit(spark)
    books = similarity.pq_train(unit, m=8, k=32, vec_col="uv",
                                sample=1024, iters=3)
    codes = similarity.pq_encode(unit, books, vec_col="uv")
    qs = unit.where(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("qid"), F.col("uv").alias("qvec"))
    multi = {(r.qid, r.rank): r.vec_id
             for r in similarity.pq_topk(codes, books, qs, k=5)
             .coalesce(1).collect()}  # one partition = mixed batches
    for qv in (0, 1, 2):
        one = qs.where(F.col("qid") == qv)
        single = {(r.qid, r.rank): r.vec_id
                  for r in similarity.pq_topk(codes, books, one,
                                              k=5).collect()}
        assert {k: v for k, v in multi.items() if k[0] == qv} == single


def test_ivfpq_index_roundtrip_and_pruning(spark, tmp_path):
    """Persisted IVF-PQ: the indexed probe returns exactly the
    in-memory IVF-PQ result for the same nprobe, and the scan reads
    ONLY the probed cell directories (static partition pruning over
    code files — never a raw vector)."""
    unit = _unit(spark)
    cent = similarity.first_k_centroids(unit, k=8, vec_col="uv")
    books = similarity.pq_train(unit, m=8, k=32, vec_col="uv",
                                sample=1024, iters=3)
    path = str(tmp_path / "ivfpq")
    similarity.write_ivfpq_index(unit, cent, books, path, vec_col="uv")
    q = unit.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("uv").alias("qvec"))
    out = similarity.ivfpq_topk_indexed(spark, path, q, k=10, nprobe=2)
    # in-memory equivalent with the same pieces
    codes = similarity.pq_encode(unit, books, vec_col="uv")
    assign = similarity.ivf_assign(unit, cent, vec_col="uv")
    probed = similarity.ivf_assign(
        q.select(F.col("qid").alias("vec_id"),
                 F.col("qvec").alias("uv")),
        cent, vec_col="uv", n=2).select("cell").distinct()
    cand = codes.join(assign, "vec_id") \
        .join(F.broadcast(probed), "cell").select("vec_id", "codes")
    mem = similarity.pq_topk(cand, books, q, k=10)
    assert ([(r.vec_id, r.rank) for r in out.orderBy("rank").collect()]
            == [(r.vec_id, r.rank) for r in mem.orderBy("rank").collect()])
    # pruning visible in the executed plan's partition filters
    plan = (spark.read.parquet(path + "/codes")
            .where(F.col("cell").isin([0, 1]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan and "cell" in plan
