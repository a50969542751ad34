"""Containment pairs, corpus snapshot diff, winsorization."""

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import dedup
from recdb_postgresql_spark.operators.profile import winsorize

SCHEMA = "doc_id long, text string"


def test_containment_finds_subset_jaccard_misses(spark):
    big = " ".join(f"w{i}" for i in range(40))
    frag = " ".join(f"w{i}" for i in range(10))  # strict prefix of big
    docs = spark.createDataFrame([(1, big), (2, frag)], SCHEMA)
    sh = dedup.word_shingles(docs)
    cont = {(r.id1, r.id2): r.containment
            for r in dedup.containment_pairs(sh, threshold=0.9).collect()}
    # frag's shingles all inside big -> containment 1.0 (direction 2->1
    # only; big is NOT contained in frag)
    assert cont == {(2, 1): 1.0}
    # symmetric Jaccard stays below a typical dedup threshold
    jac = dedup.jaccard_pairs(sh, threshold=0.0).collect()
    assert all(r.jaccard < 0.5 for r in jac)


def test_containment_candidate_mode_mirrors_directions(spark):
    a = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame([(1, a), (2, a)], SCHEMA)
    sh = dedup.word_shingles(docs)
    cand = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    got = {(r.id1, r.id2) for r in
           dedup.containment_pairs(sh, 0.9, candidates=cand).collect()}
    assert got == {(1, 2), (2, 1)}  # identical docs contain each other


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")], SCHEMA)
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")], SCHEMA)
    got = {r.doc_id: r.status
           for r in dedup.corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_null_text_is_presence_not_hash(spark):
    """A NULL text is a present document: NULL-vs-NULL is unchanged,
    NULL-vs-text is changed, and a NULL-text doc on one side only is
    added/removed by PRESENCE, never misreported via hash nullity."""
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "gone"), (5, None)], SCHEMA)
    new = spark.createDataFrame(
        [(1, None), (2, "now text"), (4, None)], SCHEMA)
    got = {r.doc_id: r.status
           for r in dedup.corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added", 5: "removed"}


def test_winsorize_null_group_rows_survive(spark):
    """NULL-group rows clip against the NULL group's own bounds (null-
    safe join) instead of silently dropping from the dataset."""
    rows = ([(i, "a", float(i)) for i in range(1, 11)]
            + [(100, None, 50.0), (101, None, -50.0), (102, None, 0.0)])
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double")
    out = {r.event_id: r.clipped
           for r in winsorize(df, lo=0.05, hi=0.95).collect()}
    assert len(out) == 13                       # nothing dropped
    # the NULL group's bounds come from its own 3 values
    assert out[100] < 50.0 and out[101] > -50.0 and out[102] == 0.0


def test_winsorize_clips_to_group_bounds(spark):
    rows = ([(i, "a", float(i)) for i in range(1, 101)]
            + [(200, "b", 1000.0), (201, "b", -1000.0), (202, "b", 0.0)])
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r.event_id: r.clipped
           for r in winsorize(df, lo=0.05, hi=0.95).collect()}
    # group a: p05 of 1..100 = 5.95, p95 = 95.05 (linear interpolation)
    assert out[1] == 5.95 and out[100] == 95.05
    assert out[50] == 50.0                      # interior untouched
    # group b bounds computed from its own 3 values, not group a's
    assert out[200] < 1000.0 and out[201] > -1000.0 and out[202] == 0.0


def test_winsorize_approx_close_to_exact(spark):
    rows = [(i, "a", float(i % 97)) for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    ex = {r.event_id: r.clipped for r in winsorize(df, exact=True).collect()}
    ap = {r.event_id: r.clipped for r in winsorize(df, exact=False).collect()}
    diffs = [abs(ex[k] - ap[k]) for k in ex]
    assert max(diffs) <= 2.0  # sketch bounds land within ~2 of exact here


def test_key_skew_report_flags_hot_and_null_keys(spark):
    from recdb_postgresql_spark.functions.skew import key_skew_report

    rows = ([(1, "x")] * 80 + [(None, "y")] * 15 + [(2, "z")] * 5)
    df = spark.createDataFrame(rows, "k long, v string")
    out = key_skew_report(df, "k", top_n=3).collect()
    assert [(r.k, r.n, r.rank) for r in out] == \
        [(1, 80, 1), (None, 15, 2), (2, 5, 3)]
    top = out[0]
    assert top.share == 0.8
    assert top.skew_x == round(80 * 3 / 100.0, 6)  # 2.4x the mean key


def test_cms_overestimates_never_under(spark):
    from recdb_postgresql_spark.functions import sketch

    rows = [(i % 30,) for i in range(900)] + [(999,)] * 100
    df = spark.createDataFrame(rows, "k long")
    cms = sketch.cms_build(df, "k", depth=4, width=16)  # tiny -> collisions
    est = {r.k: r.est for r in
           sketch.cms_estimate(cms, df.select("k"), "k",
                               depth=4, width=16).collect()}
    true = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert all(est[k] >= true[k] for k in true)       # never under
    assert est[999] >= 100
    # sketch is constant-size
    assert cms.count() <= 4 * 16


def test_cms_merge_is_sketch_of_union(spark):
    from recdb_postgresql_spark.functions import sketch

    a = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    b = spark.createDataFrame([(1,), (3,)], "k long")
    merged = sketch.cms_merge(sketch.cms_build(a, "k", 4, 16),
                              sketch.cms_build(b, "k", 4, 16))
    direct = sketch.cms_build(a.unionByName(b), "k", 4, 16)
    m = {(r.j, r.bucket): r.cnt for r in merged.collect()}
    d = {(r.j, r.bucket): r.cnt for r in direct.collect()}
    assert m == d
