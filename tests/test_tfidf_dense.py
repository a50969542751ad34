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


def test_fts_match_cnf_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "spark merge spark"),        # all + any -> score 3
         (2, "spark window error"),       # excluded by none_of
         (3, "spark only here"),          # fails any_of
         (4, "merge window no trigger")], # fails all_of
        SCHEMA)
    out = {r.doc_id: r.score
           for r in text.fts_match(docs, all_of=("spark",),
                                   any_of=("merge", "window"),
                                   none_of=("error",)).collect()}
    assert out == {1: 3}


def test_fts_match_all_only_and_empty_query(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "b c")], SCHEMA)
    got = {r.doc_id for r in text.fts_match(docs, all_of=("b",)).collect()}
    assert got == {1, 2}
    # no constraints -> every doc matches with score 0
    allm = text.fts_match(docs).collect()
    assert {r.doc_id for r in allm} == {1, 2}
    assert all(r.score == 0 for r in allm)


def test_knn_classify_majority_and_tiebreak(spark):
    from recdb_postgresql_spark.operators.similarity import knn_classify

    # nearest 3 of the query are labels (1, 1, 0) -> majority 1; at
    # k=4 the vote is a 2-2 tie -> ascending label wins (0)
    rows = [(1, [1.0, 0.0], 1), (2, [0.99, 0.14], 1),
            (3, [0.9, 0.43], 0), (4, [0.88, 0.47], 0),
            (5, [0.0, 1.0], 2)]
    lab = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>, label int")
    q = spark.createDataFrame([(100, [1.0, 0.05])],
                              "qid long, qvec array<double>")
    top3 = knn_classify(lab, q, k=3).collect()[0]
    assert (top3.pred_label, top3.votes) == (1, 2)
    tie = knn_classify(lab, q, k=4).collect()[0]
    assert (tie.pred_label, tie.votes) == (0, 2)
