"""Round-7 operators: hash_split, quality_filter (exact vs approx
paths), top_ngrams, semantic_dedup, JSONL source/sink."""

import os
import sys

import pytest
from pyspark.sql import functions as SF

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recdb_postgresql_spark.functions import sampling
from recdb_postgresql_spark.operators import dedup, similarity, text
from recdb_postgresql_spark.sources import sinks
from tests.conftest import SF_SMALL


def test_hash_split_assigns_every_row_deterministically(spark):
    df = spark.range(0, 2000).select(SF.col("id").alias("doc_id"))
    out = sampling.hash_split(df, SF.col("doc_id"),
                              {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == 2000                      # every row, exactly once
    counts = {s: list(rows.values()).count(s) for s in ("train", "val", "test")}
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.05 < counts["val"] / 2000 < 0.15
    assert 0.05 < counts["test"] / 2000 < 0.15
    # partition-layout independence (the reason this exists)
    again = {r.doc_id: r.split for r in
             sampling.hash_split(df.repartition(7), SF.col("doc_id"),
                                 {"train": 0.8, "val": 0.1, "test": 0.1})
             .collect()}
    assert rows == again
    # the train split IS the 0.8 hash sample: same buckets, same rows
    sample = {r.doc_id for r in
              sampling.hash_sample(df, SF.col("doc_id"), 0.8).collect()}
    assert {d for d, s in rows.items() if s == "train"} == sample


def test_hash_split_remainder_and_validation(spark):
    df = spark.range(0, 100).select(SF.col("id").alias("doc_id"))
    # sum < 1: the remainder falls into the LAST split — no row unassigned
    out = sampling.hash_split(df, SF.col("doc_id"), {"a": 0.3, "b": 0.3})
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(SF.count(SF.lit(1)).alias("n"))
              .collect()}
    assert sum(counts.values()) == 100
    assert counts["b"] > counts["a"]              # b absorbs the 0.4 remainder
    with pytest.raises(ValueError):
        sampling.hash_split(df, SF.col("doc_id"), {"a": 0.7, "b": 0.5})
    with pytest.raises(ValueError):
        sampling.hash_split(df, SF.col("doc_id"), {})


def test_quality_filter_approx_matches_exact(spark):
    """The approx_percentile scale path must agree with the exact rank
    path up to threshold-tie behavior: high set overlap, similar size,
    and everything it keeps clears its own threshold."""
    from recdb_postgresql_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    exact = {r.doc_id for r in text.quality_filter(docs, frac=0.5).collect()}
    approx = {r.doc_id for r in
              text.quality_filter(docs, frac=0.5, exact=False).collect()}
    n = docs.count()
    assert 0.4 * n <= len(approx) <= 0.7 * n
    overlap = len(exact & approx) / len(exact | approx)
    assert overlap > 0.9, (len(exact), len(approx), overlap)


def test_top_ngrams_counts_and_cut(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c x"),      # "a b c" twice, "b c a"/"c a b"/"b c x" once
         (2, "a b c d"),            # "a b c" once more (2 docs, 3 total)
         (3, "z z z z z")],         # "z z z" three times in one doc
        ["doc_id", "text"])
    out = {r.gram: (r.n_occurrences, r.n_docs)
           for r in text.top_ngrams(df, n=3, k=10, min_count=2).collect()}
    assert out["a b c"] == (3, 2)
    assert out["z z z"] == (3, 1)
    assert "b c x" not in out                     # min_count prunes singletons
    # k cut is by (count desc, gram): ask for top-1 -> "a b c" beats "z z z"
    top1 = text.top_ngrams(df, n=3, k=1, min_count=2).collect()
    assert [(r.gram, r.n_occurrences) for r in top1] == [("a b c", 3)]


def test_semantic_dedup_assignment(spark):
    """Two tight clusters + one singleton: each cluster collapses to
    its min id, the singleton keeps itself, keep marks survivors."""
    rows = [
        (0, [1.0, 0.0, 0.0]),     # centroid 0, cluster {0, 2}
        (1, [0.0, 1.0, 0.0]),     # centroid 1, cluster {1, 3}
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 0.999, 0.01]),
        (4, [0.0, 0.0, 1.0]),     # singleton (ties to cell 0, no pair)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]) \
        .select("vec_id", SF.col("embedding").cast("array<float>")
                .alias("embedding"))
    cents = similarity.first_k_centroids(emb, k=2)
    out = {r.vec_id: (r.canonical_id, r.keep)
           for r in dedup.semantic_dedup(emb, cents, threshold=0.95).collect()}
    assert out == {0: (0, 1), 1: (1, 1), 2: (0, 0), 3: (1, 0), 4: (4, 1)}


def _pair_map(df):
    return {(r.id1, r.id2): round(r.jaccard, 6) for r in df.collect()}


def test_prefix_filtered_pairs_exact_vs_baseline(spark):
    """Prefix filtering must return the IDENTICAL pair set + scores as
    the quadratic inverted-index baseline — it is an exact algorithm,
    not an approximation. Checked on the real corpus and at a second
    threshold (prefix lengths change with t)."""
    from recdb_postgresql_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    sh = dedup.word_shingles(docs)
    for t in (0.5, 0.8):
        base = _pair_map(dedup.jaccard_pairs(sh, threshold=t))
        pref = _pair_map(dedup.prefix_filtered_pairs(sh, threshold=t))
        assert pref == base, (t, len(base), len(pref))
    assert len(base) > 0          # the corpus does contain near-dups


def test_prefix_filtered_pairs_edge_cases(spark):
    """Identical docs (J=1, minimal prefix), disjoint docs (no pair),
    and a doc pair straddling the size filter."""
    rows = [(1, "a b c d e f"), (2, "a b c d e f"),      # identical
            (3, "q r s t u v"),                          # disjoint
            (4, "a b c")]                                # tiny: size filter
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = dedup.word_shingles(df, n=2)
    base = _pair_map(dedup.jaccard_pairs(sh, threshold=0.5))
    pref = _pair_map(dedup.prefix_filtered_pairs(sh, threshold=0.5))
    assert pref == base
    assert (1, 2) in pref and pref[(1, 2)] == 1.0


def test_jsonl_roundtrip(spark, tmp_path):
    from recdb_postgresql_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "docs_jsonl")
    sinks.write_jsonl(docs, path)
    back = sinks.read_jsonl(
        spark, path,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    orig = {tuple(r) for r in docs.collect()}
    assert {tuple(r) for r in back.select(*docs.columns).collect()} == orig
    # compressed + bounded-file variant round-trips identically
    gz = str(tmp_path / "docs_gz")
    sinks.write_jsonl(docs, gz, compression="gzip", max_records_per_file=100)
    back_gz = sinks.read_jsonl(
        spark, gz,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    assert {tuple(r) for r in back_gz.select(*docs.columns).collect()} == orig
