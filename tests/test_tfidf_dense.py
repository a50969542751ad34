"""The TF-IDF pair scorer's adaptive regime switch: the dense
block-matmul path and the sparse inverted-join path must be
row-for-row identical (rounded cosines are the contract)."""

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import text

SCHEMA = "doc_id long, text string"


def _corpus(spark):
    rows = []
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta"]
    for i in range(60):
        # overlapping topical mixes over a tiny vocabulary
        toks = [words[(i + j) % len(words)] for j in range(5)] * (1 + i % 3)
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, SCHEMA)


def test_dense_and_sparse_regimes_identical(spark):
    docs = _corpus(spark)
    dense = {(r.id1, r.id2): r.cos
             for r in text.tfidf_similar_pairs(
                 docs, top_m=3, threshold=0.3).collect()}
    sparse = {(r.id1, r.id2): r.cos
              for r in text.tfidf_similar_pairs(
                  docs, top_m=3, threshold=0.3,
                  dense_vocab_max=0).collect()}
    assert dense and dense == sparse


def test_dense_path_respects_threshold_and_order(spark):
    docs = _corpus(spark)
    out = text.tfidf_similar_pairs(docs, top_m=3, threshold=0.3).collect()
    assert all(r.cos >= 0.3 for r in out)
    assert all(r.id1 < r.id2 for r in out)
