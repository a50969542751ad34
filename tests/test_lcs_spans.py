"""Exact long-common-substring span discovery (common_span_pairs).

The gaps-and-islands diagonal-run method must return EXACTLY the
maximal shared word spans — pinned against hand-computed spans on a
constructed corpus, against a DuckDB re-derivation of the same
relational algorithm, and against a brute-force python LCS scan.
"""

import duckdb
import pytest

from recdb_postgresql_spark.operators import text


DOCS = [
    (1, "a b c d e f g h i j"),
    (2, "x x a b c d e f g y"),
    (3, "a b c d e z f g h i j"),
    (4, "p q r p q r p q r"),
    (5, "u v w p q r p q r"),
    (6, "totally different words here nothing shared at all"),
]


def _brute_spans(docs, k, min_span):
    """All maximal shared spans >= min_span detectable at gram size k:
    mirror of the diagonal-run definition, computed naively."""
    out = set()
    toks = {i: t.lower().split(" ") for i, t in docs}
    for i1 in toks:
        for i2 in toks:
            if i1 >= i2:
                continue
            w1, w2 = toks[i1], toks[i2]
            # runs of matching k-grams along each diagonal
            for diag in range(-(len(w2)), len(w1) + 1):
                run = 0
                start = None
                for p1 in range(1, len(w1) - k + 2):
                    p2 = p1 - diag
                    ok = (1 <= p2 <= len(w2) - k + 1
                          and w1[p1 - 1:p1 - 1 + k]
                          == w2[p2 - 1:p2 - 1 + k])
                    if ok:
                        if run == 0:
                            start = (p1, p2)
                        run += 1
                    if not ok or p1 == len(w1) - k + 1:
                        if run and run + k - 1 >= min_span:
                            out.add((i1, i2, start[0], start[1],
                                     run + k - 1))
                        run = 0
    return out


@pytest.mark.parametrize("k,min_span", [(3, 5), (3, 3), (2, 4)])
def test_span_set_matches_bruteforce(spark, k, min_span):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r.id1, r.id2, r.start1, r.start2, r.span_words)
           for r in text.common_span_pairs(df, k=k,
                                           min_span=min_span).collect()}
    assert got == _brute_spans(DOCS, k, min_span)


def test_known_spans_by_hand(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r.id1, r.id2, r.start1, r.start2, r.span_words)
           for r in text.common_span_pairs(df, k=3,
                                           min_span=5).collect()}
    # doc1/doc2 share "a b c d e f g" (7 words), doc1 pos 1, doc2 pos 3
    assert (1, 2, 1, 3, 7) in got
    # doc1/doc3 share "a b c d e" and "f g h i j" (5 words each)
    assert (1, 3, 1, 1, 5) in got
    assert (1, 3, 6, 7, 5) in got
    assert not any(p[0] == 6 or p[1] == 6 for p in got)


def test_duckdb_relational_mirror(spark):
    """The exact SQL the driver oracle runs, over the same corpus."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r.id1, r.id2, r.start1, r.start2, r.span_words)
           for r in text.common_span_pairs(df, k=3,
                                           min_span=4).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{t}')" for i, t in DOCS)
                + ") AS v(doc_id, text)")
    want = {tuple(r) for r in con.execute("""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w
           FROM documents),
g AS (SELECT doc_id, u.i AS pos,
             array_to_string(w[u.i:u.i+2], ' ') AS gram
      FROM t, unnest(range(1, greatest(len(w)-1, 1))) AS u(i)),
m AS (SELECT a.doc_id AS id1, b.doc_id AS id2, a.pos AS i, b.pos AS j,
             a.pos - b.pos AS diag
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
r AS (SELECT *, i - ROW_NUMBER() OVER (PARTITION BY id1, id2, diag
                                       ORDER BY i) AS isl
      FROM m)
SELECT id1, id2, MIN(i) AS start1, MIN(j) AS start2,
       COUNT(*) + 2 AS span_words
FROM r GROUP BY id1, id2, diag, isl
HAVING COUNT(*) + 2 >= 4
""").fetchall()}
    assert got == want


def test_max_gram_df_drops_only_boilerplate(spark):
    """With the df cut at 2, a gram shared by 3+ docs is dropped and
    its span disappears; rarer spans survive untouched."""
    docs = [(1, "common header line one two three tail_a x"),
            (2, "common header line one two three tail_b y"),
            (3, "common header line one two three tail_c z"),
            (10, "rare shared span only here alpha"),
            (11, "rare shared span only here beta")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cut = {(r.id1, r.id2) for r in
           text.common_span_pairs(df, k=3, min_span=5,
                                  max_gram_df=2).collect()}
    assert (10, 11) in cut
    assert not any(a in (1, 2, 3) for a, _ in cut)
    full = {(r.id1, r.id2) for r in
            text.common_span_pairs(df, k=3, min_span=5).collect()}
    assert (1, 2) in full and (10, 11) in full


def test_winnow_anchored_candidates_are_exact(spark):
    """Winnowing (k-gram size kw, window w) guarantees a shared
    fingerprint for any common span >= kw + w - 1 words, so with
    min_span >= kw + w - 1 the candidate-driven span set equals the
    exhaustive one."""
    from recdb_postgresql_spark.operators.text import winnow_fingerprints

    kw, w = 3, 4  # guarantee bound: spans >= 6 words share a print
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    fp = winnow_fingerprints(df, k=kw, w=w)
    a = fp.select(fp.doc_id.alias("id1"), "fp")
    b = fp.select(fp.doc_id.alias("id2"), "fp")
    cand = (a.join(b, "fp").where("id1 < id2")
            .select("id1", "id2").distinct())
    full = {tuple(r) for r in
            text.common_span_pairs(df, k=3, min_span=6).collect()}
    anchored = {tuple(r) for r in
                text.common_span_pairs(df, k=3, min_span=6,
                                       candidate_pairs=cand).collect()}
    assert anchored == full and full  # non-empty: doc1/doc2 7-word span


def test_strip_duplicate_spans_keep_first(spark):
    docs = [(1, "alpha beta gamma delta epsilon zeta unique_one"),
            (2, "prefix alpha beta gamma delta epsilon zeta tail_two"),
            (3, "nothing in common whatsoever here at all")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_removed) for r in
           text.strip_duplicate_spans(df, k=3, min_span=5).collect()}
    # doc1 (lower id) keeps its copy; doc2 loses the 6 shared words
    assert got[1] == ("alpha beta gamma delta epsilon zeta unique_one", 0)
    assert got[2] == ("prefix tail_two", 6)
    assert got[3][1] == 0


def test_self_span_pairs_finds_internal_repeats(spark):
    docs = [
        # "one two three four five" repeated at offset 6 (pos 1 and 7)
        (1, "one two three four five gap one two three four five end"),
        (2, "no internal repetition in this document at all okay"),
        # periodic: "a b" x6 — runs on several offsets
        (3, "a b a b a b a b a b a b"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.start1, r.start2, r.span_words)
           for r in text.self_span_pairs(df, k=3, min_span=5).collect()}
    assert (1, 1, 7, 5) in got
    assert not any(d == 2 for d, *_ in got)
    # doc 3: offset-2 diagonal gives the 10-word repeat (pos 1 vs 3)
    assert (3, 1, 3, 10) in got


def test_self_span_pairs_duckdb_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {tuple(r) for r in
           text.self_span_pairs(df, k=2, min_span=3).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{t}')" for i, t in DOCS)
                + ") AS v(doc_id, text)")
    want = {tuple(r) for r in con.execute("""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w
           FROM documents),
g AS (SELECT doc_id, u.i AS pos,
             array_to_string(w[u.i:u.i+1], ' ') AS gram
      FROM t, unnest(range(1, greatest(len(w), 1))) AS u(i)),
m AS (SELECT a.doc_id, a.pos AS i, b.pos AS j, a.pos - b.pos AS diag
      FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.gram = b.gram
      AND a.pos < b.pos),
r AS (SELECT *, i - ROW_NUMBER() OVER (PARTITION BY doc_id, diag
                                       ORDER BY i) AS isl
      FROM m)
SELECT doc_id, MIN(i) AS start1, MIN(j) AS start2,
       COUNT(*) + 1 AS span_words
FROM r GROUP BY doc_id, diag, isl
HAVING COUNT(*) + 1 >= 3
""").fetchall()}
    assert got == want
