"""Unigram-LM (SentencePiece-style) tokenizer pins: EM likelihood
monotonicity at fixed vocabulary, recovery of planted pieces,
single-char coverage of unseen words, determinism, and the
train/encode agreement on what a document is."""

from __future__ import annotations

import math

import pytest

from recdb_postgresql_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def planted(spark):
    # words built from the pieces "ab" / "cd"; "xyz" is atomic noise
    rows = [(i, "ababab cdcdcd abcd xyz") for i in range(20)]
    rows += [(100 + i, "abab cdcd") for i in range(10)]
    return _docs(spark, rows)


def test_em_likelihood_monotone_at_fixed_vocab(spark, planted):
    # large vocab_size so no pruning happens between iterations —
    # pure EM must be monotone non-decreasing in corpus log-likelihood
    _, trace = text.unigram_train(planted, vocab_size=10_000,
                                  em_iters=5, return_trace=True)
    assert len(trace) == 5
    for a, b in zip(trace, trace[1:]):
        assert b >= a - 1e-9, trace


def test_planted_pieces_survive_pruning(spark, planted):
    pieces = text.unigram_train(planted, vocab_size=12, em_iters=4,
                                max_piece_len=2)
    vocab = {p for p, _ in pieces}
    assert "ab" in vocab and "cd" in vocab
    # single chars always retained for coverage
    for ch in "abcdxyz":
        assert ch in vocab
    assert len(vocab) <= 12


def test_viterbi_segments_with_planted_pieces(spark, planted):
    pieces = text.unigram_train(planted, vocab_size=12, em_iters=4,
                                max_piece_len=2)
    out = {r["doc_id"]: (r["n_tokens"], r["n_words"])
           for r in text.unigram_encode(planted, pieces).collect()}
    # "ababab cdcdcd abcd xyz" -> 3 + 3 + 2 tokens for the planted
    # part; the 5th multi-char slot learns "xy" or "yz" so xyz is 2
    assert out[0] == (3 + 3 + 2 + 2, 4)
    assert out[100] == (2 + 2, 2)


def test_unseen_word_falls_back_to_chars(spark, planted):
    pieces = text.unigram_train(planted, vocab_size=12, em_iters=2,
                                max_piece_len=2)
    probe = _docs(spark, [(1, "qqq ab")])
    row = text.unigram_encode(probe, pieces).collect()[0]
    # "qqq" (q unseen entirely) -> 3 floor-prob chars; "ab" -> 1 piece
    assert row["n_tokens"] == 4 and row["n_words"] == 2


def test_null_and_empty_text(spark, planted):
    pieces = text.unigram_train(planted, vocab_size=12, em_iters=2)
    probe = spark.createDataFrame([(1, None), (2, "  ")],
                                  "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_words"])
           for r in text.unigram_encode(probe, pieces).collect()}
    assert got == {1: (0, 0), 2: (0, 0)}


def test_deterministic(spark, planted):
    a = text.unigram_train(planted, vocab_size=12, em_iters=3)
    b = text.unigram_train(planted, vocab_size=12, em_iters=3)
    assert a == b
    for _p, lp in a:
        assert lp <= 0.0 and math.isfinite(lp)


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert text.unigram_train(empty, vocab_size=12) == []
