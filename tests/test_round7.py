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


def test_strip_common_spans_semantics(spark):
    """Shared bigram across 3 docs (df=3 > max_df=2) is stripped —
    BOTH words of every occurrence; a doc without it is untouched; a
    doc shorter than n passes through; an all-boilerplate doc empties."""
    rows = [(1, "alpha foo bar beta"),
            (2, "foo bar gamma delta"),
            (3, "epsilon foo bar"),
            (4, "zeta eta theta"),
            (5, "x"),                       # shorter than n=2: no grams
            (6, "foo bar")]                 # entirely boilerplate
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.clean_text, r.n_removed)
           for r in text.strip_common_spans(df, n=2, max_doc_freq=3).collect()}
    assert out[4] == ("zeta eta theta", 0)
    assert out[5] == ("x", 0)
    # df('foo bar') = 4 > 3 -> stripped everywhere
    assert out[1] == ("alpha beta", 2)
    assert out[2] == ("gamma delta", 2)
    assert out[3] == ("epsilon", 2)
    assert out[6] == ("", 2)


def test_strip_common_spans_overlapping_spans(spark):
    """Overlapping boilerplate occurrences union their covered
    positions (no double-count, no gap): 'a b a b' with hot gram
    'a b' covers positions 0-1 and 2-3; 'b a' stays cold."""
    rows = [(i, "a b") for i in range(5)] + [(99, "a b a b q")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.clean_text, r.n_removed)
           for r in text.strip_common_spans(df, n=2, max_doc_freq=4).collect()}
    assert out[99] == ("q", 4)


def test_bm25_ranking_semantics(spark):
    """More query-term occurrences rank higher at equal length; docs
    with no query term are absent; rarer terms out-weigh common ones."""
    rows = [(1, "spark spark spark pad"),
            (2, "spark pad pad pad"),
            (3, "pad pad pad pad"),
            (4, "merge pad pad pad"),   # 'merge' rarer than 'spark'
            (5, "spark pad pad pad")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text.bm25_topk(df, ["spark", "merge"], k=10).collect()
    ids = [r.doc_id for r in out]
    assert 3 not in ids                       # no query term -> excluded
    scores = {r.doc_id: r.score for r in out}
    assert scores[1] > scores[2]              # more tf of same term wins
    assert scores[4] > scores[2]              # rare term beats common term
    # rare-term idf dominates here: ln(1+4.5/1.5) vs ln(1+2.5/3.5)
    assert ids[0] == 4
    assert scores[2] == scores[5]             # identical docs tie exactly


def test_importance_weights_neutral_and_directional(spark):
    """target == corpus -> every bucket ratio is 1 -> all weights 0;
    a target concentrated on one doc's vocabulary pulls that doc's
    weight above one with disjoint vocabulary."""
    rows = [(1, "aa bb aa bb aa bb"), (2, "cc dd cc dd cc dd")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    neutral = {r.doc_id: r.log_weight
               for r in text.importance_weights(df, df, n=2).collect()}
    assert all(abs(v) < 1e-9 for v in neutral.values())
    target = df.where(SF.col("doc_id") == 1)
    w = {r.doc_id: r.log_weight
         for r in text.importance_weights(df, target, n=2).collect()}
    assert w[1] > w[2]


def test_stratified_sample_fractions_and_determinism(spark):
    df = spark.range(0, 4000).select(
        SF.col("id").alias("doc_id"),
        SF.when(SF.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"))
    out = sampling.stratified_sample(
        df, "lang", SF.col("doc_id"), {"en": 1.0, "zh": 0.0}, default=0.5)
    got = {r.lang: r.cnt for r in
           out.groupBy("lang").agg(SF.count(SF.lit(1)).alias("cnt")).collect()}
    assert got.get("en") == 2000 and "zh" not in got
    # default applies to unlisted groups; assignment is layout-independent
    out2 = sampling.stratified_sample(
        df.repartition(13), "lang", SF.col("doc_id"), {"zh": 0.25})
    ids = {r.doc_id for r in out2.collect()}
    ids_again = {r.doc_id for r in sampling.stratified_sample(
        df, "lang", SF.col("doc_id"), {"zh": 0.25}).collect()}
    assert ids == ids_again
    assert {r.doc_id for r in df.where("lang = 'en'").collect()} <= ids


def test_pagerank_star_and_mass(spark):
    """Star graph: the hub outranks every leaf; leaves tie exactly;
    total mass stays ~1 (undirected symmetrization has no dangling)."""
    from recdb_postgresql_spark.operators import graph

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], ["id1", "id2"])
    r = {row.id: row.rank for row in graph.pagerank(edges).collect()}
    assert r[0] > max(r[i] for i in range(1, 6))
    assert len({r[i] for i in range(1, 6)}) == 1
    assert abs(sum(r.values()) - 1.0) < 1e-4


def test_pagerank_directed_dangling_conserves_mass(spark):
    """Directed chain 1->2->3: node 3 is dangling; its mass teleports
    uniformly each round, so total rank still sums to ~1 and the sink
    accumulates the most."""
    from recdb_postgresql_spark.operators import graph

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["id1", "id2"])
    r = {row.id: row.rank
         for row in graph.pagerank(edges, directed=True).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-4
    assert r[3] > r[2] > r[1]


def test_profile_sketch_path_close_to_exact(spark):
    """The approx (100 TB) path must agree with the exact path on
    everything non-sketched (counts, min/max, mean) and be close on
    distincts/quantiles."""
    from recdb_postgresql_spark.operators import profile
    from recdb_postgresql_spark.sources.readers import load_table

    ev = load_table(spark, SF_SMALL, "events")
    exact = {(r.column, r.stat): r.value
             for r in profile.profile_table(ev, ["user_id", "value"]).collect()}
    approx = {(r.column, r.stat): r.value
              for r in profile.profile_table(
                  ev, ["user_id", "value"], exact=False).collect()}
    assert exact.keys() == approx.keys()
    for k, v in exact.items():
        _c, stat = k
        if stat in ("n_rows", "n_notnull", "min", "max", "mean"):
            assert approx[k] == pytest.approx(v, abs=1e-6), k
        elif stat == "n_distinct":
            # rsd=0.02 sketch: allow a few standard errors
            assert approx[k] == pytest.approx(v, rel=0.1), k
        else:  # quantiles: sketch accuracy
            span = exact[(_c, "max")] - exact[(_c, "min")]
            assert abs(approx[k] - v) <= 0.05 * span + 1e-6, k


def test_profile_null_handling(spark):
    from recdb_postgresql_spark.operators import profile

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0), (None, 4.0)],
        "a int, b double")
    out = {(r.column, r.stat): r.value
           for r in profile.profile_table(df, ["a", "b"]).collect()}
    assert out[("a", "n_rows")] == 4.0
    assert out[("a", "n_notnull")] == 3.0
    assert out[("b", "n_notnull")] == 3.0
    assert out[("a", "n_distinct")] == 3.0
    assert out[("b", "mean")] == pytest.approx(8.0 / 3, abs=1e-6)


def test_lm_perplexity_ranks_noise_above_boilerplate(spark):
    """A document made of the corpus's dominant transitions scores LOW
    perplexity; a document of unique transitions scores HIGH; 1-token
    docs are omitted."""
    rows = [(i, "the cat sat on the mat") for i in range(8)]
    rows += [(100, "the cat sat on the mat"),        # pure boilerplate
             (101, "zq xv wk jp qb vn"),             # pure novelty
             (102, "solo")]                          # no transitions
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.n_transitions, r.log2_ppl)
           for r in text.lm_perplexity(df).collect()}
    assert 102 not in out
    assert out[100][0] == 5
    assert out[100][1] < out[101][1]


def test_triangle_count_known_graphs(spark):
    """K4: every node sits in C(3,2)=3 triangles; a path contributes
    none; duplicate/reversed edges collapse."""
    from recdb_postgresql_spark.operators import graph

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    path = [(10, 11), (11, 12), (12, 13)]
    dupes = [(1, 0), (2, 0)]                    # reversed duplicates
    edges = spark.createDataFrame(k4 + path + dupes, ["id1", "id2"])
    out = {r.id: r.n_triangles
           for r in graph.triangle_count(edges).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}      # path nodes absent


def test_weighted_sample_properties(spark):
    """Heavy-weight rows dominate the sample; zero/negative weights
    never appear; the same rows win under any partitioning."""
    df = spark.range(0, 1000).select(
        SF.col("id").alias("doc_id"),
        SF.when(SF.col("id") < 100, 100.0)
        .when(SF.col("id") < 900, 1.0)
        .otherwise(SF.lit(0.0)).alias("w"))
    got = sampling.weighted_sample(df, SF.col("w"), SF.col("doc_id"), k=80)
    ids = {r.doc_id for r in got.collect()}
    assert len(ids) == 80
    assert not any(i >= 900 for i in ids)        # zero-weight excluded
    heavy = sum(1 for i in ids if i < 100)
    # 100 rows at weight 100 vs 800 at weight 1: heavy rows should take
    # the clear majority of an 80-row sample
    assert heavy >= 60, heavy
    again = {r.doc_id for r in sampling.weighted_sample(
        df.repartition(13), SF.col("w"), SF.col("doc_id"), k=80).collect()}
    assert ids == again


def _bpe_reference(word_counts, num_merges):
    """Pure-Python BPE on a word-frequency table (the original
    algorithm), greedy left-to-right application, ties by
    (count desc, left, right)."""
    vocab = {tuple(list(w) + ["</w>"]): n for w, n in word_counts.items()}
    merges = []
    for rank in range(num_merges):
        counts = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, left, right, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference(spark):
    """The distributed trainer must produce the IDENTICAL merge
    sequence (pairs, order, counts) as the classic word-frequency BPE
    algorithm, and the encoder's token counts must match re-applying
    those merges by hand."""
    rows = [(1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, "low new lowest")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    wc = {}
    for _i, t in rows:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    expect = _bpe_reference(wc, 8)
    got = text.bpe_train(df, num_merges=8)
    assert got == expect, (got, expect)

    enc = {r.doc_id: r.n_tokens for r in text.bpe_encode(df, got).collect()}

    def encode_word(w, merges):
        syms = list(w) + ["</w>"]
        for _rank, left, right, _cnt in merges:
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms = out
        return len(syms)

    for i, t in rows:
        assert enc[i] == sum(encode_word(w, got) for w in t.split()), i


def test_bpe_encode_null_text_is_zero_tokens(spark):
    """Train drops NULL-text rows; encode must agree (0 tokens / 0
    words), never tokenize the literal string 'None'."""
    df = spark.createDataFrame([(1, "low low"), (2, None)],
                               "doc_id long, text string")
    m = text.bpe_train(df, num_merges=2)
    out = {r.doc_id: (r.n_tokens, r.n_words)
           for r in text.bpe_encode(df, m).collect()}
    assert out[2] == (0, 0)
    assert out[1][0] > 0


def test_profile_sketch_handles_awkward_column_names(spark):
    """The sketch path must accept names needing backticks (it builds
    Columns, not SQL strings) — same contract as the exact path."""
    from recdb_postgresql_spark.operators import profile

    df = spark.range(10).selectExpr("cast(id as double) as `event value`")
    out = profile.profile_table(df, ["event value"], exact=False)
    assert out.count() == 9


def test_pagerank_duplicate_edges_collapse(spark):
    """Simple-graph semantics: duplicate/reversed edges and self-loops
    must not skew rank mass (same contract as triangle_count)."""
    from recdb_postgresql_spark.operators import graph

    clean = spark.createDataFrame([(1, 2), (1, 4)], ["id1", "id2"])
    noisy = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (1, 4), (3, 3)], ["id1", "id2"])
    a = {r.id: r.rank for r in graph.pagerank(clean).collect()}
    b = {r.id: r.rank for r in graph.pagerank(noisy).collect()}
    assert a == b


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: every node converges
    to its clique's min id; the bridge does not merge them (each
    bridge endpoint has 3 in-clique neighbors vs 1 cross)."""
    from recdb_postgresql_spark.operators import graph

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    e = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {r["id"]: r["community"]
           for r in graph.label_propagation(e, rounds=4).collect()}
    assert {got[i] for i in (1, 2, 3, 4)} == {1}
    assert {got[i] for i in (10, 11, 12, 13)} == {10}


def test_label_propagation_tie_breaks_min_label(spark):
    """A path 1-2-3: node 2 sees labels {1, 3} once each -> min wins.
    Synchronous round 1: node1 <- 2, node2 <- 1, node3 <- 2."""
    from recdb_postgresql_spark.operators import graph

    e = spark.createDataFrame([(1, 2), (2, 3)], "id1 long, id2 long")
    got = {r["id"]: r["community"]
           for r in graph.label_propagation(e, rounds=1).collect()}
    assert got == {1: 2, 2: 1, 3: 2}


def test_label_propagation_seeds_and_isolated(spark):
    """Seeded variant: clamped seeds spread along the path (seed
    labels sit below the id space so min-label ties resolve toward
    them); a node absent from seeds starts at its own id."""
    from recdb_postgresql_spark.operators import graph

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id1 long, id2 long")
    seeds = spark.createDataFrame([(1, 0), (4, 0)],
                                  "id long, label long")
    got = {r["id"]: r["community"]
           for r in graph.label_propagation(e, rounds=4,
                                            seed_labels=seeds).collect()}
    assert set(got.values()) == {0}


def test_table_fingerprint_localizes_single_row_diff(spark):
    from pyspark.sql import functions as F

    from recdb_postgresql_spark.operators.profile import table_fingerprint

    a = spark.createDataFrame(
        [(i, f"v{i}", None if i == 3 else i * 10) for i in range(200)],
        ["id", "s", "x"])
    cols = ["id", "s", "x"]
    fp = lambda df: {r["bucket"]: (r["n_rows"], r["xor_sig"])  # noqa: E731
                     for r in table_fingerprint(df, F.col("id"), cols,
                                                 n_buckets=8).collect()}
    base = fp(a)
    # identical content, different row order / partitioning -> equal
    assert fp(a.orderBy(F.desc("id")).repartition(7)) == base
    # one changed value flips exactly one bucket's signature
    b = a.withColumn("x", F.when(F.col("id") == 42, 999)
                     .otherwise(F.col("x")))
    diff = [k for k in base if fp(b)[k] != base[k]]
    assert len(diff) == 1
    # NULL is distinguishable from the string 'None'/absent value
    c = a.withColumn("x", F.when(F.col("id") == 3, 30)
                     .otherwise(F.col("x")))
    assert fp(c) != base
