"""Hand-rolled Bloom-filter semi-join pre-filter.

Spark's adaptive runtime row-level filtering injects Bloom filters
into shuffle joins on its own terms; `bloom_filter_agg` is not
registered as a user-facing SQL function in this build, so the
operator surface exposes the same pattern explicitly: aggregate the
dimension keys into a constant-size bit array, evaluate membership
MAP-SIDE on the fact table, and only then run the exact join. The
result is EXACT (the Bloom pass only admits false positives, which
the real join removes); what the sketch buys at 100 TB is the
fact-side shuffle volume — rows that cannot join are dropped at scan
speed before the Exchange.

The sketch is the only thing collected (m_bits/8 bytes — the same
legitimacy class as the IVF probed-cell list): the dimension side is
aggregated distributedly with one narrow (word, mask) shuffle of at
most m_bits/64 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_build(keys: DataFrame, key: Column, m_bits: int = 1 << 16,
                k: int = 3) -> list[int]:
    """Aggregate a key column into an ``m_bits``-bit Bloom filter,
    returned as ``m_bits/64`` int64 words. Distributed: per-key bit
    positions explode to (word, mask) pairs, one bit_or aggregate
    collapses them map-side; only the finished words (constant size,
    independent of key count) reach the driver."""
    assert m_bits % 64 == 0
    n_words = m_bits // 64
    masks = F.array(*[
        F.pmod(F.xxhash64(F.lit(s), key), F.lit(m_bits)) for s in range(k)])
    wb = (keys.select(F.explode(masks).alias("p"))
          .select(F.floor(F.col("p") / 64).cast("int").alias("w"),
                  # dynamic shift amount needs call_function: the
                  # python shiftleft binding only takes a literal
                  F.call_function(
                      "shiftleft", F.lit(1).cast("long"),
                      F.pmod(F.col("p"), F.lit(64)).cast("int"))
                  .alias("m"))
          .groupBy("w").agg(F.expr("bit_or(m)").alias("mask")))
    words = [0] * n_words
    for r in wb.collect():
        words[r["w"]] = r["mask"]
    return words


def bloom_might_contain(key: Column, words: list[int], k: int = 3) -> Column:
    """Map-side membership test against a built filter: true for every
    key that was inserted (no false negatives), occasionally true for
    one that wasn't. Pure codegen arithmetic — k xxhash64 calls and k
    array lookups per row, no join, no shuffle."""
    m_bits = len(words) * 64
    lit_words = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for s in range(k):
        p = F.pmod(F.xxhash64(F.lit(s), key), F.lit(m_bits))
        word = F.element_at(lit_words,
                            (F.floor(p / 64) + 1).cast("int"))
        bit = F.call_function("shiftleft", F.lit(1).cast("long"),
                              F.pmod(p, F.lit(64)).cast("int"))
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_semijoin(fact: DataFrame, dim: DataFrame, fact_key: str,
                   dim_key: str, m_bits: int = 1 << 16,
                   k: int = 3) -> DataFrame:
    """Exact semi-join with a Bloom pre-filter: build the filter from
    ``dim``'s keys, drop non-members from ``fact`` map-side, then run
    the real LEFT SEMI join on the survivors. Identical rows to a
    plain semi-join (oracle-checkable); at 100 TB the pre-filter cuts
    the fact-side Exchange to the join by the true-match fraction
    (plus the false-positive rate ~(1 - e^(-kn/m))^k)."""
    words = bloom_build(dim, F.col(dim_key), m_bits=m_bits, k=k)
    pre = fact.where(bloom_might_contain(F.col(fact_key), words, k=k))
    return pre.join(dim.select(F.col(dim_key).alias(fact_key)).distinct(),
                    fact_key, "left_semi")
