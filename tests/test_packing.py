"""Sequence packing semantics (operators/text.pack_sequences): the
cumsum -> (pack_id, offset) arithmetic, shard isolation, straddling."""

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import text as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_arithmetic_single_shard(spark):
    """Force one shard (n_shards=1): offsets/pack ids follow the
    running cumsum in doc_id order, straddles counted."""
    docs = _docs(spark, [
        (1, "a b c"),          # 3 toks: pack 0, offset 0
        (2, "d e f g"),        # 4 toks: pack 0, offset 3
        (3, " ".join(["x"] * 5)),  # 5 toks: starts at 7, ends 12 -> straddles
        (4, "y"),              # starts at 12: pack 1, offset 2
    ])
    out = {r.doc_id: (r.shard, r.n_tokens, r.pack_id, r.offset,
                      r.n_packs_spanned)
           for r in T.pack_sequences(docs, capacity=10,
                                     n_shards=1).collect()}
    assert out[1] == (0, 3, 0, 0, 1)
    assert out[2] == (0, 4, 0, 3, 1)
    assert out[3] == (0, 5, 0, 7, 2)   # spans packs 0 and 1
    assert out[4] == (0, 1, 1, 2, 1)


def test_pack_exact_boundary_no_phantom_straddle(spark):
    """A document ending exactly at a pack boundary spans one pack,
    and the next doc starts at offset 0 of the next pack."""
    docs = _docs(spark, [(1, " ".join(["a"] * 10)), (2, "b c")])
    out = {r.doc_id: (r.pack_id, r.offset, r.n_packs_spanned)
           for r in T.pack_sequences(docs, capacity=10,
                                     n_shards=1).collect()}
    assert out[1] == (0, 0, 1)
    assert out[2] == (1, 0, 1)


def test_pack_shards_are_independent_and_deterministic(spark):
    """Shard assignment is pure md5(doc_id): re-running and reordering
    input rows changes nothing; cumsum never crosses shards (total
    tokens per (shard, pack<last) == capacity is not required, but
    every offset must be < capacity and pack ids start at 0 in EVERY
    shard)."""
    rows = [(i, " ".join(["w"] * (i % 7 + 1))) for i in range(100)]
    a = T.pack_sequences(_docs(spark, rows), capacity=16, n_shards=4)
    b = T.pack_sequences(_docs(spark, rows[::-1]), capacity=16, n_shards=4)
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    assert a.where(F.col("offset") >= 16).count() == 0
    per_shard_min = {r.shard: r.m for r in
                     a.groupBy("shard").agg(F.min("pack_id").alias("m"))
                     .collect()}
    assert set(per_shard_min.values()) == {0} and len(per_shard_min) == 4
