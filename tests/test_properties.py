"""Property-based invariants for the CF kernels (hypothesis) — beyond
the reference's test strategy (SURVEY §5: it has none)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from recdb_postgresql_spark.operators import cf

ratings_strategy = st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 6),
              st.floats(0.5, 5.0, allow_nan=False)),
    min_size=3, max_size=25, unique_by=lambda t: (t[0], t[1]))


@st.composite
def ratings_tables(draw):
    return draw(ratings_strategy)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=ratings_tables())
def test_item_cos_invariants(spark, rows):
    r = spark.createDataFrame(rows, "user long, item long, rating double") \
        .groupBy("user", "item").agg(cf.F.avg("rating").alias("rating"))
    model = cf.train_item_cos(r).collect()
    for m in model:
        assert m.item1 < m.item2                      # upper triangle
        assert 0 < m.similarity <= 1.0 + 1e-9         # positive ratings => [0,1]
        assert not math.isnan(m.similarity)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=ratings_tables())
def test_item_pearson_invariants(spark, rows):
    r = spark.createDataFrame(rows, "user long, item long, rating double") \
        .groupBy("user", "item").agg(cf.F.avg("rating").alias("rating"))
    model = cf.train_item_pearson(r).collect()
    for m in model:
        assert m.item1 < m.item2
        assert m.similarity != 0 and not math.isnan(m.similarity)
        assert -1.0 - 1e-9 <= m.similarity <= 1.0 + 1e-9


texts_strategy = st.lists(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "y2"]),
             min_size=0, max_size=30).map(" ".join),
    min_size=1, max_size=6)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=texts_strategy)
def test_chunking_roundtrip_property(spark, texts):
    """For ANY token stream: chunks reconstruct the normalized text and
    chunk sizes sum to the token count (empty docs keep one row)."""
    from recdb_postgresql_spark.operators import text as text_ops

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    out = sorted(text_ops.chunk_documents(docs, chunk_tokens=5).collect(),
                 key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        toks = t.strip().split() if t.strip() else [""]
        chunks = by_doc[i]
        assert " ".join(c.chunk_text for c in chunks) == " ".join(toks)
        assert sum(c.n_tokens for c in chunks) == len(toks)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=texts_strategy)
def test_winnowing_fingerprints_property(spark, texts):
    """For ANY document: >=1 fingerprint, every fingerprint is one of
    the doc's own k-gram hashes, and fingerprints are distinct per
    doc (the winnowing set, not a multiset)."""
    from recdb_postgresql_spark.functions.hashing import md5_long
    from recdb_postgresql_spark.operators import text as text_ops
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    fps = text_ops.winnow_fingerprints(docs, k=3, w=4).collect()
    per_doc = {}
    for r in fps:
        per_doc.setdefault(r.doc_id, []).append(r.fp)
    toks3 = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks3) - 3, F.lit(0)))
    grams = docs.select(
        "doc_id",
        F.explode(F.transform(
            idx, lambda i: md5_long(F.concat_ws(" ", F.slice(toks3, i + 1, 3))))
        ).alias("h")).collect()
    hashes = {}
    for r in grams:
        hashes.setdefault(r.doc_id, set()).add(r.h)
    for i in range(len(texts)):
        assert per_doc.get(i), f"doc {i} lost all fingerprints"
        assert len(per_doc[i]) == len(set(per_doc[i]))
        assert set(per_doc[i]) <= hashes[i]


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=ratings_tables())
def test_predict_emits_full_grid(spark, rows):
    r = spark.createDataFrame(rows, "user long, item long, rating double") \
        .groupBy("user", "item").agg(cf.F.avg("rating").alias("rating"))
    model = cf.train_item_cos(r)
    users = r.select("user").distinct()
    items = r.select("item").distinct()
    n_u, n_i = users.count(), items.count()
    scored = cf.predict_item_cf(model, r, users, items)
    assert scored.count() == n_u * n_i                # all pairs, incl. rated
    assert scored.where(cf.F.isnan("score")).count() == 0


asof_events = st.lists(
    st.tuples(st.integers(0, 2),          # key
              st.integers(0, 20),         # ts
              st.booleans()),             # side: True = right
    min_size=1, max_size=30)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=asof_events)
def test_asof_join_matches_bruteforce(spark, rows):
    """asof_join == the O(n^2) per-row spec: for each left row, the
    right row with max (ts, rid) among same-key rows with ts <= l.ts —
    on arbitrary key/ts collision patterns, including duplicate
    timestamps on both sides."""
    from recdb_postgresql_spark.operators import temporal

    left = [(i, k, ts) for i, (k, ts, r) in enumerate(rows) if not r]
    right = [(i, k, ts, float(i)) for i, (k, ts, r) in enumerate(rows) if r]
    if not left:
        return
    ldf = spark.createDataFrame(left, "lid long, k long, ts long")
    rdf = spark.createDataFrame(
        right or [(-1, -999, -999, 0.0)],   # empty right: no matches
        "rid long, k long, ts long, v double")
    got = {r.lid: (r.v, r.matched_ts)
           for r in temporal.asof_join(
               ldf, rdf, on="k", value_cols=("v",),
               right_tiebreak="rid").collect()}
    for lid, k, lts in left:
        cands = [(ts, rid, v) for rid, rk, ts, v in right
                 if rk == k and ts <= lts]
        want = (None, None)
        if cands:
            ts, rid, v = max(cands)
            want = (v, ts)
        assert got[lid] == want, (lid, got[lid], want)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=asof_events)
def test_asof_bucketed_matches_bruteforce(spark, rows):
    """asof_join_bucketed == the same O(n^2) spec. time_bucket=4 on
    ts in [0, 20] forces real cross-bucket carries (a match 2+ buckets
    back, left-only buckets, empty buckets) rather than degenerating
    to one bucket."""
    from recdb_postgresql_spark.operators import temporal

    left = [(i, k, ts) for i, (k, ts, r) in enumerate(rows) if not r]
    right = [(i, k, ts, float(i)) for i, (k, ts, r) in enumerate(rows) if r]
    if not left:
        return
    ldf = spark.createDataFrame(left, "lid long, k long, ts long")
    rdf = spark.createDataFrame(
        right or [(-1, -999, -999, 0.0)],   # empty right: no matches
        "rid long, k long, ts long, v double")
    got = {r.lid: (r.v, r.matched_ts)
           for r in temporal.asof_join_bucketed(
               ldf, rdf, on="k", time_bucket=4, value_cols=("v",),
               right_tiebreak="rid").collect()}
    for lid, k, lts in left:
        cands = [(ts, rid, v) for rid, rk, ts, v in right
                 if rk == k and ts <= lts]
        want = (None, None)
        if cands:
            ts, rid, v = max(cands)
            want = (v, ts)
        assert got[lid] == want, (lid, got[lid], want)


graph_edges = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1, max_size=40)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(edges=graph_edges)
def test_star_cc_equals_propagation(spark, edges):
    """Alternating large-star/small-star produces the identical
    (id -> min-reachable-id) map as label propagation on arbitrary
    random graphs — self-loops dropped, duplicates collapsed."""
    from recdb_postgresql_spark.operators import dedup

    edges = sorted({(a, b) if a < b else (b, a)
                    for a, b in edges if a != b})
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    star = {r.id: r.component
            for r in dedup.connected_components_star(pairs).collect()}
    prop = {r.id: r.component
            for r in dedup.connected_components(pairs, max_iters=40,
                                                local_threshold=0).collect()}
    local = {r.id: r.component
             for r in dedup.connected_components(pairs).collect()}
    assert star == prop
    assert local == prop


events_strategy = st.lists(
    st.tuples(st.integers(0, 3),          # key
              st.integers(0, 60),         # ts
              st.floats(0.0, 9.0, allow_nan=False)),
    min_size=1, max_size=30)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=events_strategy)
def test_resample_ffill_matches_bruteforce(spark, rows):
    """resample_ffill == per-key python brute force: dense bucket
    spine from first to last observed bucket, last-in-bucket value by
    (ts, event_id), forward-filled across gaps."""
    from recdb_postgresql_spark.operators import temporal

    recs = [(i, k, t, v) for i, (k, t, v) in enumerate(rows)]
    ev = spark.createDataFrame(
        recs, "event_id long, k long, ts long, value double")
    bucket = 7
    got = {(r.k, r.bucket_start): (r.n_events, r.value)
           for r in temporal.resample_ffill(
               ev, on="k", bucket=bucket, tiebreak="event_id").collect()}

    want = {}
    for k in {k for _, k, _, _ in recs}:
        mine = [(t, i, v) for i, kk, t, v in recs if kk == k]
        bs = [t // bucket for t, _, _ in mine]
        carry = None
        for b in range(min(bs), max(bs) + 1):
            inb = sorted((t, i, v) for t, i, v in mine if t // bucket == b)
            if inb:
                carry = inb[-1][2]
            want[(k, b * bucket)] = (len(inb), carry)
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e", "f"]),
             min_size=1, max_size=12).map(" ".join),
    min_size=2, max_size=12),
    threshold=st.sampled_from([0.4, 0.6, 0.9]))
def test_prefix_filter_equals_bruteforce_jaccard(spark, texts, threshold):
    """prefix_filtered_pairs is EXACT: on random low-entropy corpora
    (worst case for candidate pruning) its pair set + scores must
    equal a pure-Python brute force over bigram shingle sets, at
    every threshold."""
    from recdb_postgresql_spark.operators import dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id1, r.id2): round(r.jaccard, 6)
           for r in dedup.prefix_filtered_pairs(
               dedup.word_shingles(df, n=2), threshold=threshold).collect()}

    # mirror word_shingles: slice of length n at every start 0..max(len-n,0)
    def spark_shingles(t):
        toks = t.lower().split()
        out = set()
        for i in range(max(len(toks) - 2, 0) + 1):
            s = " ".join(toks[i:i + 2])
            if s:
                out.add(s)
        return out

    expect = {}
    for i, ti in rows:
        for j, tj in rows:
            if i >= j:
                continue
            a, b = spark_shingles(ti), spark_shingles(tj)
            if not a or not b:
                continue
            inter = len(a & b)
            jac = inter / (len(a) + len(b) - inter)
            if jac >= threshold and inter > 0:
                expect[(i, j)] = round(jac, 6)
    assert got == expect, (got, expect)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(
    st.lists(st.sampled_from(["p", "q", "r", "s"]),
             min_size=1, max_size=8).map(" ".join),
    min_size=2, max_size=8),
    max_df=st.sampled_from([1, 2, 3]))
def test_strip_spans_matches_bruteforce(spark, texts, max_df):
    """strip_common_spans against a pure-Python reference: same df
    computation (distinct docs per positional bigram), same coverage
    union, same rebuilt text."""
    from recdb_postgresql_spark.operators import text as text_ops

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.clean_text, r.n_removed)
           for r in text_ops.strip_common_spans(
               df, n=2, max_doc_freq=max_df).collect()}

    def grams(toks):
        return [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)] \
            if len(toks) >= 2 else []

    docfreq = {}
    for _i, t in rows:
        for g in set(grams(t.lower().split())):
            docfreq[g] = docfreq.get(g, 0) + 1
    hot = {g for g, c in docfreq.items() if c > max_df}
    expect = {}
    for i, t in rows:
        toks = t.lower().split()
        covered = set()
        for p, g in enumerate(grams(toks)):
            if g in hot:
                covered |= {p, p + 1}
        kept = [w for p, w in enumerate(toks) if p not in covered]
        expect[i] = (" ".join(kept), len(toks) - len(kept))
    assert got == expect, (got, expect)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(
    st.lists(st.sampled_from(["spark", "merge", "pad", "row", "col"]),
             min_size=1, max_size=10).map(" ".join),
    min_size=2, max_size=10))
def test_bm25_matches_bruteforce(spark, texts):
    """bm25_topk against a pure-Python reference of the same formula
    (Lucene +1 idf, k1=1.2, b=0.75) on random corpora."""
    import math

    from recdb_postgresql_spark.operators import text as text_ops

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    terms = ["spark", "merge"]
    got = {r.doc_id: r.score
           for r in text_ops.bm25_topk(df, terms, k=100).collect()}

    toks = {i: t.split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {q: sum(1 for v in toks.values() if q in v) for q in terms}
    expect = {}
    for i, tk in toks.items():
        s = 0.0
        for q in terms:
            tf = tk.count(q)
            idf = math.log(1 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
        if s > 0:
            expect[i] = round(s, 6)
    assert got == expect, (got, expect)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc"]),
             min_size=1, max_size=8).map(" ".join),
    min_size=2, max_size=8))
def test_lm_perplexity_matches_bruteforce(spark, texts):
    """lm_perplexity against a pure-Python add-k bigram LM."""
    import math

    from recdb_postgresql_spark.operators import text as text_ops

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.n_transitions, r.log2_ppl)
           for r in text_ops.lm_perplexity(df).collect()}

    toks = {i: t.split() for i, t in rows}
    vocab = len({w for v in toks.values() for w in v})
    big, uni = {}, {}
    for v in toks.values():
        for a, b in zip(v, v[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            uni[a] = uni.get(a, 0) + 1
    expect = {}
    for i, v in toks.items():
        trans = list(zip(v, v[1:]))
        if not trans:
            continue
        lp = [math.log2((big[(a, b)] + 0.5) / (uni[a] + 0.5 * vocab))
              for a, b in trans]
        expect[i] = (len(trans), round(-sum(lp) / len(lp), 6))
    assert got == expect, (got, expect)


# random tiny-vocabulary corpora maximize shared grams and diagonal
# collisions — the adversarial regime for the span-run derivation
corpus_strategy = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=14)
    .map(lambda ws: " ".join(ws)),
    min_size=2, max_size=6)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=corpus_strategy)
def test_common_span_pairs_matches_bruteforce_on_random_corpora(
        spark, texts):
    from recdb_postgresql_spark.operators import text as text_ops
    from tests.test_lcs_spans import _brute_spans

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id1, r.id2, r.start1, r.start2, r.span_words)
           for r in text_ops.common_span_pairs(df, k=2,
                                               min_span=3).collect()}
    assert got == _brute_spans(docs, 2, 3)
