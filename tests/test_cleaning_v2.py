"""Corpus-cleaning v2 + entity resolution: segment dedup with doc
reconstruction, C4 heuristic flags, CCNet tiers, token-budget
selection, blocked fuzzy matching. Oracle parity is covered by
test_oracle_parity; these pin semantics and plan shape."""

import os
import sys

import pytest
from pyspark.sql import Row, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recdb_postgresql_spark.operators import linkage, text


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in enumerate(rows)])


# ---------------------------------------------------------------- segment


def test_segment_dedup_removes_shared_segments(spark):
    # "x y z" is a width-3 segment shared by docs 0 and 1; each doc's
    # other segment is unique.
    d = _docs(spark, ["x y z a b c", "x y z d e f", "g h i j k l"])
    out = {r["doc_id"]: r for r in
           text.segment_dedup(d, width=3, max_doc_freq=1).collect()}
    assert out[0]["n_segments"] == 2 and out[0]["n_removed"] == 1
    assert out[0]["clean_text"] == "a b c"
    assert out[1]["clean_text"] == "d e f"
    assert out[2]["n_removed"] == 0
    assert out[2]["clean_text"] == "g h i j k l"


def test_segment_dedup_identity_when_freq_unbounded(spark):
    """max_doc_freq >= n_docs keeps everything: reconstruction must be
    lossless (clean_text == original) — pins segment order."""
    d = _docs(spark, ["a b c d e f g", "a b c d e f g h i j"])
    out = text.segment_dedup(d, width=3, max_doc_freq=10).collect()
    orig = {r["doc_id"]: r["text"] for r in d.collect()}
    for r in out:
        assert r["clean_text"] == orig[r["doc_id"]]
        assert r["n_removed"] == 0


def test_segment_dedup_fully_removed_doc_survives(spark):
    d = _docs(spark, ["x y z", "x y z"])
    out = {r["doc_id"]: r for r in
           text.segment_dedup(d, width=3, max_doc_freq=1).collect()}
    assert set(out) == {0, 1}
    assert out[0]["clean_text"] == "" and out[0]["n_removed"] == 1


def test_segment_dedup_within_doc_repeat_counts_once(spark):
    """A doc repeating its own boilerplate contributes ONE distinct
    doc to the segment's frequency — the segment survives."""
    d = _docs(spark, ["p q r p q r"])
    out = text.segment_dedup(d, width=3, max_doc_freq=1).collect()[0]
    assert out["n_removed"] == 0
    assert out["clean_text"] == "p q r p q r"


# ---------------------------------------------------------------- c4


def test_c4_flags_rules(spark):
    long_good = " ".join(["the"] + [f"w{i}" for i in range(40)])
    d = _docs(spark, [
        "short doc the",                 # flag_short
        long_good,                       # keep
        " ".join(["rep"] * 40 + ["the"]),  # low diversity
        " ".join([f"verylongword{i:04d}" for i in range(40)]),  # no stop + long
    ])
    out = {r["doc_id"]: r for r in text.c4_flags(d, min_words=30).collect()}
    assert out[0]["flag_short"] and not out[0]["keep"]
    assert out[1]["keep"]
    assert out[2]["flag_low_diversity"] and not out[2]["keep"]
    assert out[3]["flag_no_stopword"] and out[3]["flag_long_words"]


def test_c4_flags_is_map_side_only(spark):
    """Zero shuffles: the filter must run at scan speed."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["docs_c4_flags"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- tiers


def test_ccnet_tiers_balanced_and_ordered(spark):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["docs_ccnet_tiers"](
        spark, "/root/testdata/sf0.001").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            counts[r["tier"]] += 1
        assert max(counts.values()) - min(counts.values()) <= 1, lang
        head_max = max(r["log2_ppl"] for r in rs if r["tier"] == "head")
        tail_min = min(r["log2_ppl"] for r in rs if r["tier"] == "tail")
        assert head_max <= tail_min + 1e-9, lang


# ---------------------------------------------------------------- budget


def test_token_budget_select_edges(spark):
    d = spark.createDataFrame([
        Row(doc_id=i, source="s", text=" ".join(["the word"] * 25))
        for i in range(4)])
    all_sel = text.token_budget_select(d, budget=10**9).collect()
    assert all(r["selected"] for r in all_sel)
    none_sel = text.token_budget_select(d, budget=0).collect()
    assert not any(r["selected"] for r in none_sel)
    # budget 75: docs are 50 tokens each -> doc1 starts at cum 50 < 75
    # (selected, straddles), doc2 starts at 100 (cut)
    some = {r["doc_id"]: r for r in
            text.token_budget_select(d, budget=75).collect()}
    assert sum(1 for r in some.values() if r["selected"]) == 2


def test_token_budget_prefers_quality(spark):
    good = " ".join(["the a of and to in is it"] * 8)   # stopword-rich
    bad = " ".join(["zz !! ?? ##"] * 16)                # punct-heavy
    d = spark.createDataFrame([Row(doc_id=0, source="s", text=bad),
                               Row(doc_id=1, source="s", text=good)])
    out = {r["doc_id"]: r for r in
           text.token_budget_select(d, budget=1).collect()}
    assert out[1]["selected"] and not out[0]["selected"]


# ---------------------------------------------------------------- linkage


def test_blocked_matches_and_best(spark):
    df = spark.createDataFrame([
        Row(id=1, name="Customer#0001", g=1),
        Row(id=2, name="Customer#0002", g=1),   # dist 1 from id1
        Row(id=3, name="Customer#9998", g=1),   # dist >2 from id1/id2
        Row(id=4, name="Customer#0001", g=2),   # other block: never paired
    ])
    m = linkage.blocked_matches(df, F.col("g"), id_col="id",
                                name_col="name", max_dist=2)
    pairs = {(r["id1"], r["id2"]): r["dist"] for r in m.collect()}
    assert pairs == {(1, 2): 1}
    best = linkage.best_match(m).collect()
    assert [(r["id1"], r["id2"], r["dist"]) for r in best] == [(1, 2, 1)]


def test_blocked_matches_no_cross_product_plan(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["er_customer_matches"](
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------- leakage


def test_split_leakage_flags_only_cross_split_pairs(spark):
    from recdb_postgresql_spark.operators import dedup

    pairs = spark.createDataFrame(
        [Row(id1=1, id2=2, jaccard=0.9), Row(id1=1, id2=3, jaccard=0.8)])
    assign = spark.createDataFrame(
        [Row(doc_id=1, split="train"), Row(doc_id=2, split="train"),
         Row(doc_id=3, split="test")])
    out = dedup.split_leakage(pairs, assign).collect()
    assert [(r["id1"], r["id2"], r["split1"], r["split2"])
            for r in out] == [(1, 3, "train", "test")]


def test_split_leakage_query_subset_of_verified_pairs(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sf = "/root/testdata/sf0.001"
    leak = {(r["id1"], r["id2"]) for r in qs["split_leakage_pairs"](spark, sf).collect()}
    allp = {(r["id1"], r["id2"]) for r in qs["dedup_lsh_verified"](spark, sf).collect()}
    assert leak <= allp


# ---------------------------------------------------------------- vectors


def test_unit_normalize_norms_and_zero_vector(spark):
    import math

    from recdb_postgresql_spark.operators import similarity

    emb = spark.createDataFrame([
        Row(vec_id=1, embedding=[3.0, 4.0]),
        Row(vec_id=2, embedding=[0.0, 0.0]),
    ])
    out = {r["vec_id"]: r["unit"] for r in
           similarity.unit_normalize(emb).collect()}
    assert math.isclose(sum(x * x for x in out[1]) ** 0.5, 1.0,
                        rel_tol=1e-12)
    assert out[1][0] == pytest.approx(0.6)
    assert out[2] == [0.0, 0.0]          # no NaN on zero vectors


def test_unit_normalize_makes_cosine_a_dot(spark):
    """After unit_normalize, dot == cosine of the originals."""
    from recdb_postgresql_spark.functions.vector import cosine_sim, dot
    from recdb_postgresql_spark.operators import similarity

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .limit(20))
    u = similarity.unit_normalize(emb)
    a = emb.alias("a").join(emb.alias("b"),
                            F.col("a.vec_id") < F.col("b.vec_id"))
    cos = {(r["i"], r["j"]): r["c"] for r in a.select(
        F.col("a.vec_id").alias("i"), F.col("b.vec_id").alias("j"),
        F.round(cosine_sim(F.col("a.embedding"), F.col("b.embedding")), 6)
        .alias("c")).collect()}
    ua = u.alias("a").join(u.alias("b"),
                           F.col("a.vec_id") < F.col("b.vec_id"))
    dots = {(r["i"], r["j"]): r["c"] for r in ua.select(
        F.col("a.vec_id").alias("i"), F.col("b.vec_id").alias("j"),
        F.round(dot(F.col("a.unit"), F.col("b.unit")), 6).alias("c"))
        .collect()}
    for k, v in cos.items():
        assert abs(dots[k] - v) <= 2e-6, k


def test_dim_stats_shape(spark):
    from recdb_postgresql_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = similarity.dim_stats(emb).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["min_val"] <= r["mean"] <= r["max_val"]
        assert r["std"] >= 0


def test_char_entropy_extremes_and_nulls(spark):
    """Repeated-char spam ~0 nats; uniform alphabet = ln(26); NULL and
    empty text score 0.0 without dropping the row."""
    import math

    from recdb_postgresql_spark.operators import text

    docs = [(1, "aaaaaaaaaaaaaaaa"),
            (2, "abcdefghijklmnopqrstuvwxyz"),
            (3, None),
            (4, ""),
            (5, "The QUICK brown fox")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.char_entropy for r in
           text.char_entropy(df).collect()}
    assert got[1] == 0.0
    assert abs(got[2] - round(math.log(26), 6)) < 1e-9
    assert got[3] == 0.0 and got[4] == 0.0
    # case-insensitive: 'T' and 't' are one symbol
    assert got[5] > 2.0


def test_temperature_mix_flattens_toward_uniform(spark):
    from recdb_postgresql_spark.functions.sampling import (
        temperature_fractions, temperature_mix)

    rows = ([(i, "en") for i in range(800)]
            + [(i + 1000, "de") for i in range(150)]
            + [(i + 2000, "zh") for i in range(50)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    from pyspark.sql import functions as F

    # alpha=1 keeps the natural distribution: every fraction is 1.0
    fr1 = {r.lang: r.fraction for r in
           temperature_fractions(df, "lang", alpha=1.0).collect()}
    assert all(f == 1.0 for f in fr1.values())
    # alpha=0.5 downsamples the head, keeps the tail whole
    fr = {r.lang: r.fraction for r in
          temperature_fractions(df, "lang", alpha=0.5).collect()}
    # tail groups cap at 1.0 (upsampling is a training-loop concern);
    # only the head is cut: q_de = 1000*sqrt(150)/z > 150 -> capped
    assert fr["zh"] == 1.0 and fr["de"] == 1.0
    assert fr["en"] < 1.0
    out = temperature_mix(df, "lang", F.col("doc_id"), alpha=0.5)
    by = {r.lang: r.n for r in
          out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # head share shrinks toward the tail; zh fully kept
    assert by["zh"] == 50
    assert by["en"] / 800 < by["de"] / 150
    # deterministic: same rows on a re-run
    again = temperature_mix(df, "lang", F.col("doc_id"), alpha=0.5)
    assert {r.doc_id for r in out.collect()} == \
        {r.doc_id for r in again.collect()}
