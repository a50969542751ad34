"""r12 optimization round: the shared-subtree hooks must be
value-identical to the inline forms they replace.

The optimizations themselves (localCheckpoint materializations) cannot
change values by construction, but three grew new API surface this
round — pin each against its pre-existing twin on synthetic data.
"""

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.functions.sketch import cms_build
from recdb_postgresql_spark.operators import dedup


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark):
    data = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "an entirely different document about spark plans"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "another entirely different document about spark"),
    ]
    return spark.createDataFrame(data, "doc_id long, text string")


def test_cms_build_weighted_identical(spark):
    """cms_build over raw rows == cms_build over per-key counts with
    weight_col (bucket counters add) — the identity the
    lineitem_joinsize_cms restructure rests on."""
    vals = [(v,) for v in [1, 1, 1, 2, 2, 3, 7, 7, 7, 7, 9]]
    df = spark.createDataFrame(vals, "k long")
    raw = cms_build(df, "k", depth=3, width=8)
    counts = df.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    pre = cms_build(counts, "k", depth=3, width=8, weight_col="c")
    assert _rows(raw) == _rows(pre)
    # null keys are excluded on both paths
    with_null = spark.createDataFrame(vals + [(None,)], "k long")
    assert _rows(cms_build(with_null, "k", depth=3, width=8)) == _rows(raw)


def test_lsh_verified_pairs_hashed_identical(docs):
    """lsh_verified_pairs(hashed=...) == lsh_verified_pairs(shingled)
    — the sharing hook dedup_lsh_recall uses."""
    sh = dedup.word_shingles(docs)
    inline = dedup.lsh_verified_pairs(sh, threshold=0.5, num_hashes=8,
                                      bands=4, rows_per_band=2)
    hashed = dedup.hash_shingles(dedup.word_shingles(docs)) \
        .localCheckpoint(eager=True)
    shared = dedup.lsh_verified_pairs(None, threshold=0.5, num_hashes=8,
                                      bands=4, rows_per_band=2,
                                      hashed=hashed)
    assert _rows(inline.select("id1", "id2",
                               F.round("jaccard", 6).alias("j"))) == \
        _rows(shared.select("id1", "id2", F.round("jaccard", 6).alias("j")))
    assert len(_rows(shared)) > 0  # non-vacuous: dup docs exist


def test_lsh_candidate_pairs_checkpoint_identical(docs):
    """The banded-signature checkpoint is an execution hint only."""
    sig = dedup.minhash_signatures(dedup.word_shingles(docs), num_hashes=8)
    on = dedup.lsh_candidate_pairs(sig, bands=4, rows_per_band=2,
                                   checkpoint=True)
    off = dedup.lsh_candidate_pairs(sig, bands=4, rows_per_band=2,
                                    checkpoint=False)
    assert _rows(on) == _rows(off)
    assert len(_rows(on)) > 0
