"""Round-7 wave 1: MERGE upsert (pure transform + EventStore apply),
SCD Type-2 build, and the exact edit-distance join."""

import os

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.operators.dml import merge_into
from recdb_postgresql_spark.operators.linkage import edit_distance_join
from recdb_postgresql_spark.operators.temporal import scd2_build
from recdb_postgresql_spark.sources.event_store import EventStore

T_SCHEMA = "k long, name string, v double"


def test_merge_into_full_matrix(spark):
    target = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], T_SCHEMA)
    source = spark.createDataFrame(
        [(2, "B", 20.0, False),   # matched update
         (3, None, 0.0, True),    # matched tombstone -> drop
         (4, "d", 4.0, False),    # insert
         (5, None, 0.0, True)],   # source-only tombstone -> no-op
        "k long, name string, v double, is_del boolean")
    out = {r.k: (r.name, r.v)
           for r in merge_into(target, source, ["k"],
                               delete_col="is_del").collect()}
    assert out == {1: ("a", 1.0), 2: ("B", 20.0), 4: ("d", 4.0)}


def test_merge_into_null_key_upserts_not_duplicates(spark):
    target = spark.createDataFrame([(None, "x", 1.0), (1, "a", 1.0)],
                                   T_SCHEMA)
    source = spark.createDataFrame([(None, "X", 9.0)], T_SCHEMA)
    out = {r.k: (r.name, r.v)
           for r in merge_into(target, source, ["k"]).collect()}
    # the NULL key MATCHED (null-safe) and updated in place
    assert out == {None: ("X", 9.0), 1: ("a", 1.0)}


def test_merge_into_insert_false_and_partial_update_cols(spark):
    target = spark.createDataFrame([(1, "a", 1.0)], T_SCHEMA)
    source = spark.createDataFrame([(1, "Z", 9.0), (2, "n", 5.0)],
                                   T_SCHEMA)
    rows = merge_into(target, source, ["k"], update_cols=["v"],
                      insert=False).collect()
    assert [(r.k, r.name, r.v) for r in rows] == [(1, "a", 9.0)]


def test_merge_into_rejects_unknown_update_col(spark):
    target = spark.createDataFrame([(1, "a", 1.0)], T_SCHEMA)
    source = spark.createDataFrame([(1, "b", 2.0)], T_SCHEMA)
    with pytest.raises(ValueError, match="update_cols"):
        merge_into(target, source, ["k"], update_cols=["ghost"])


SCHEMA = "userid long, itemid long, ratingval double"


def test_event_store_merge_unpartitioned(spark, tmp_path):
    s = EventStore(spark, str(tmp_path / "ev"))
    s.append(spark.createDataFrame(
        [(1, 10, 4.0), (1, 20, 2.0), (2, 10, 5.0)], SCHEMA))
    src = spark.createDataFrame(
        [(1, 10, 1.0, False), (2, 10, 0.0, True), (3, 30, 3.0, False)],
        "userid long, itemid long, ratingval double, is_del boolean")
    v0 = s.version
    s.merge(src, ["userid", "itemid"], delete_col="is_del")
    rows = {(r.userid, r.itemid): r.ratingval for r in s.read().collect()}
    assert rows == {(1, 10): 1.0, (1, 20): 2.0, (3, 30): 3.0}
    # transactional: old snapshot still time-travelable
    assert s.read(version=v0).count() == 3


def test_event_store_merge_partition_scoped(spark, tmp_path):
    s = EventStore(spark, str(tmp_path / "pev"), partition_col="userid")
    s.append(spark.createDataFrame(
        [(1, 10, 4.0), (2, 10, 5.0), (3, 30, 1.0)], SCHEMA))

    def mtimes():
        out = {}
        for dirpath, _d, files in os.walk(str(tmp_path / "pev")):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = {p: t for p, t in mtimes().items() if "part=3" in p}
    src = spark.createDataFrame(
        [(1, 10, 9.0, False), (4, 40, 4.0, False), (2, 10, 0.0, True)],
        "userid long, itemid long, ratingval double, is_del boolean")
    s.merge(src, ["userid", "itemid"], delete_col="is_del")
    rows = {(r.userid, r.itemid): r.ratingval for r in s.read().collect()}
    assert rows == {(1, 10): 9.0, (3, 30): 1.0, (4, 40): 4.0}
    # untouched partition's files are byte-identical on disk
    after = {p: t for p, t in mtimes().items() if "part=3" in p}
    assert before == after and before


def test_event_store_merge_rejects_partition_col_update(spark, tmp_path):
    s = EventStore(spark, str(tmp_path / "pev2"), partition_col="userid")
    s.append(spark.createDataFrame([(1, 10, 4.0)], SCHEMA))
    with pytest.raises(ValueError, match="partition column"):
        s.merge(spark.createDataFrame([(1, 10, 5.0)], SCHEMA),
                ["itemid"], update_cols=["userid"])


def test_scd2_collapses_and_closes_intervals(spark):
    ev = spark.createDataFrame(
        [(1, 100, 1, "free"), (1, 200, 2, "free"),   # no-change collapsed
         (1, 300, 3, "paid"), (1, 400, 4, None),     # paid -> NULL = change
         (1, 500, 5, None),                          # NULL -> NULL = same
         (2, 100, 6, "paid")],
        "user_id long, ts long, event_id long, state string")
    rows = sorted(
        scd2_build(ev, ["user_id"], "ts", ["state"],
                   order_cols=["event_id"]).collect(),
        key=lambda r: (r.user_id, r.valid_from))
    got = [(r.user_id, r.state, r.valid_from, r.valid_to, r.is_current)
           for r in rows]
    assert got == [(1, "free", 100, 300, False),
                   (1, "paid", 300, 400, False),
                   (1, None, 400, None, True),
                   (2, "paid", 100, None, True)]


def test_scd2_same_ts_ties_break_by_order_col(spark):
    ev = spark.createDataFrame(
        [(1, 100, 2, "b"), (1, 100, 1, "a")],
        "user_id long, ts long, event_id long, state string")
    rows = sorted(scd2_build(ev, ["user_id"], "ts", ["state"],
                             order_cols=["event_id"]).collect(),
                  key=lambda r: r.valid_from is None)
    assert [(r.state, r.is_current) for r in rows] == [("a", False),
                                                       ("b", True)]


def _brute(spark, df, d):
    a = df.select(F.col("id").alias("id1"), F.col("name").alias("n1"))
    b = df.select(F.col("id").alias("id2"), F.col("name").alias("n2"))
    return {(r.id1, r.id2) for r in
            a.crossJoin(b)
            .where((F.col("id1") < F.col("id2"))
                   & (F.levenshtein("n1", "n2") <= d)).collect()}


@pytest.mark.parametrize("d,q,strategy", [
    (1, 2, "deletion"), (2, 2, "deletion"),
    (1, 2, "prefix"), (2, 2, "prefix"), (2, 3, "prefix"),
    (3, 2, "prefix"),
])
def test_edit_distance_join_exact_vs_bruteforce(spark, d, q, strategy):
    """Deterministic battery over a nasty little universe: short
    strings, highly repetitive strings ('aaaa' has ONE distinct gram),
    near-misses, and a shared-prefix family — every pair the brute
    force finds, the prefix-filtered plan must find."""
    names = ["a", "ab", "abc", "aaaa", "aaab", "aaaaaaa", "banana",
             "banane", "bananas", "kitten", "sitten", "sittin",
             "prefix_000", "prefix_001", "prefix_010", "prefix_100",
             "xyz", "", "zzzz", "zzzy"]
    df = spark.createDataFrame(list(enumerate(names)),
                               "id long, name string")
    got = {(r.id1, r.id2) for r in
           edit_distance_join(df, "id", "name", max_dist=d, q=q,
                              strategy=strategy).collect()}
    assert got == _brute(spark, df, d)


def test_edit_distance_join_deletion_caps_at_two(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, name string")
    with pytest.raises(ValueError, match="max_dist <= 2"):
        edit_distance_join(df, max_dist=3, strategy="deletion")


def test_edit_distance_join_emits_verified_distance(spark):
    df = spark.createDataFrame(
        [(1, "kitten"), (2, "sitten"), (3, "sitting")],
        "id long, name string")
    rows = {(r.id1, r.id2): r.dist
            for r in edit_distance_join(df, "id", "name",
                                        max_dist=2, q=2).collect()}
    assert rows == {(1, 2): 1, (2, 3): 2}


def test_cdc_diff_roundtrip_law(spark):
    """merge_into(old, cdc_diff(old, new)) must reproduce new exactly
    — including NULL-involving updates in both directions, deletes,
    and inserts with NULL fields."""
    from recdb_postgresql_spark.operators.dml import cdc_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, None, 3.0), (4, "keep", 4.0),
         (5, "gone", 5.0)], T_SCHEMA)
    new = spark.createDataFrame(
        [(1, "a", 1.0),          # unchanged -> no diff row
         (2, "b", 2.0),          # NULL -> value update
         (3, None, None),        # value -> NULL update
         (4, "keep", 4.0),       # unchanged
         (6, None, 6.0)], T_SCHEMA)  # insert with NULL field
    diff = cdc_diff(old, new, ["k"])
    ops = {r.k: r.op for r in diff.collect()}
    assert ops == {2: "update", 3: "update", 5: "delete", 6: "insert"}
    src = diff.withColumn("is_del", F.col("op") == "delete").drop("op")
    merged = merge_into(old, src, ["k"], delete_col="is_del")
    got = {(r.k, r.name, r.v) for r in merged.collect()}
    want = {(r.k, r.name, r.v) for r in new.collect()}
    assert got == want


def test_cdc_diff_tombstone_carries_old_row(spark):
    from recdb_postgresql_spark.operators.dml import cdc_diff

    old = spark.createDataFrame([(1, "last known", 9.0)], T_SCHEMA)
    new = spark.createDataFrame([], T_SCHEMA)
    r = cdc_diff(old, new, ["k"]).collect()[0]
    assert (r.op, r.k, r.name, r.v) == ("delete", 1, "last known", 9.0)


def test_merge_update_exprs_additive(spark):
    """Computed matched-updates (Delta's whenMatchedUpdate set=...):
    counters ADD instead of replace; inserts still take source
    values; plain update_cols coexist."""
    target = spark.createDataFrame([(1, "a", 10.0), (2, "b", 5.0)],
                                   T_SCHEMA)
    source = spark.createDataFrame([(1, "A", 3.0), (9, "new", 7.0)],
                                   T_SCHEMA)
    out = {r.k: (r.name, r.v)
           for r in merge_into(
               target, source, ["k"],
               update_exprs={"v": lambda t, s: t("v") + s("v")}).collect()}
    assert out == {1: ("A", 13.0), 2: ("b", 5.0), 9: ("new", 7.0)}


def test_merge_update_exprs_rejects_key_target(spark):
    t = spark.createDataFrame([(1, "a", 1.0)], T_SCHEMA)
    with pytest.raises(ValueError, match="update_exprs"):
        merge_into(t, t, ["k"],
                   update_exprs={"k": lambda a, b: a("k")})


def test_streaming_continuous_rollup(spark, tmp_path):
    """The continuous-aggregate pattern: micro-batches of raw events
    pre-aggregate to per-key partials and fold ADDITIVELY into the
    summary store — counts accumulate across batches."""
    from recdb_postgresql_spark.streaming import StreamingMerger

    summary = EventStore(spark, str(tmp_path / "rollup"))
    summary.append(spark.createDataFrame(
        [], "event_type string, n long, sum_value double"))

    def partials(batch):
        return (batch.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("value").alias("sum_value")))

    merger = StreamingMerger(
        summary, ["event_type"], pre_aggregate=partials,
        update_exprs={"n": lambda t, s: t("n") + s("n"),
                      "sum_value": lambda t, s: t("sum_value")
                      + s("sum_value")})
    raw = "event_type string, value double"
    merger.on_batch(spark.createDataFrame(
        [("click", 1.0), ("click", 2.0), ("view", 5.0)], raw))
    merger.on_batch(spark.createDataFrame(
        [("click", 10.0), ("buy", 4.0)], raw))
    rows = {r.event_type: (r.n, r.sum_value)
            for r in summary.read().collect()}
    assert rows == {"click": (3, 13.0), "view": (1, 5.0),
                    "buy": (1, 4.0)}


def test_streaming_merger_requires_exactly_one_strategy(spark, tmp_path):
    from recdb_postgresql_spark.streaming import StreamingMerger

    s = EventStore(spark, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="exactly one"):
        StreamingMerger(s, ["k"])
    with pytest.raises(ValueError, match="exactly one"):
        StreamingMerger(s, ["k"], seq_col="seq",
                        pre_aggregate=lambda b: b)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_into_random_vs_python_reference(spark, seed):
    """Randomized battery: merge_into against a plain-Python dict
    merge over frames with NULL keys, NULL values, tombstones and
    inserts — the full semantic space, not just the hand cases."""
    import random

    rnd = random.Random(seed)

    def val():
        return None if rnd.random() < 0.2 else round(rnd.random() * 10, 3)

    tkeys = [None] + list(range(8))
    target_rows = [(k, rnd.choice(["a", "b", None]), val())
                   for k in tkeys if rnd.random() < 0.8]
    skeys = rnd.sample([None] + list(range(12)),
                       k=rnd.randint(1, 8))
    source_rows = [(k, rnd.choice(["x", None]), val(),
                    rnd.random() < 0.3) for k in skeys]
    target = spark.createDataFrame(target_rows, T_SCHEMA)
    source = spark.createDataFrame(
        source_rows, "k long, name string, v double, is_del boolean")
    got = {(r.k, r.name, r.v)
           for r in merge_into(target, source, ["k"],
                               delete_col="is_del").collect()}
    ref = {k: (n, v) for k, n, v in target_rows}
    for k, n, v, dele in source_rows:
        if dele:
            ref.pop(k, None)
        else:
            ref[k] = (n, v)
    want = {(k, n, v) for k, (n, v) in ref.items()}
    assert got == want, (seed, got ^ want)


@pytest.mark.parametrize("seed", [0, 1])
def test_scd2_random_vs_python_reference(spark, seed):
    import random

    rnd = random.Random(seed)
    rows = []
    eid = 0
    for u in range(4):
        t = 0
        for _ in range(rnd.randint(1, 12)):
            t += rnd.randint(1, 5)
            rows.append((u, t, eid, rnd.choice(["a", "b", None])))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, state string")
    got = {(r.user_id, r.state, r.valid_from, r.valid_to, r.is_current)
           for r in scd2_build(ev, ["user_id"], "ts", ["state"],
                               order_cols=["event_id"]).collect()}
    want = set()
    by_user = {}
    for u, t, e, s in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_user.setdefault(u, []).append((t, s))
    for u, seq in by_user.items():
        kept = [seq[0]]
        for t, s in seq[1:]:
            if s != kept[-1][1]:
                kept.append((t, s))
        for i, (t, s) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            want.add((u, s, t, nxt, nxt is None))
    assert got == want, seed


def test_scd2_rejects_reserved_output_names(spark):
    ev = spark.createDataFrame([(1, 1, "a")],
                               "u long, ts long, valid_to string")
    with pytest.raises(ValueError, match="reserves"):
        scd2_build(ev, ["u"], "ts", ["valid_to"])


@pytest.mark.parametrize("d,strategy", [
    (1, "deletion"), (2, "deletion"), (1, "prefix"), (2, "prefix"),
])
def test_edit_distance_join_two_table_exact(spark, d, strategy):
    """Two-table (R x S) form vs the brute-force cross join — the
    dirty-reimport linkage shape, over the same nasty universe plus
    mutated twins on the right."""
    names = ["a", "ab", "aaaa", "banana", "kitten", "prefix_000",
             "prefix_001", "zzzz", ""]
    left = spark.createDataFrame(list(enumerate(names)),
                                 "id long, name string")
    rights = [(100 + i, n[:-1] + "0" if n else "x")
              for i, n in enumerate(names)]
    right = spark.createDataFrame(rights, "id long, name string")
    got = {(r.id1, r.id2) for r in
           edit_distance_join(left, "id", "name", max_dist=d,
                              strategy=strategy, right=right).collect()}
    a = left.select(F.col("id").alias("id1"), F.col("name").alias("n1"))
    b = right.select(F.col("id").alias("id2"), F.col("name").alias("n2"))
    want = {(r.id1, r.id2) for r in
            a.crossJoin(b)
            .where(F.levenshtein("n1", "n2") <= d).collect()}
    assert got == want, (d, strategy, got ^ want)


@pytest.mark.parametrize("d", [1, 2])
def test_edit_join_prefix_short_string_heavy_exact(spark, d):
    """A corpus DOMINATED by short strings (single tokens with
    <= q*d distinct grams — the residue regime, VERDICT r7 wrong #3):
    the prefix strategy's deletion-routed residue must still return
    the exact brute-force pair set."""
    names = ([chr(ord("a") + i) for i in range(26)]          # 1-char
             + [chr(ord("a") + i) * 2 for i in range(26)]    # aa..zz
             + ["ab", "ba", "ax", "xa", "xy", "yx", ""]
             + ["longenoughstring", "longenoughstrinG"])
    df = spark.createDataFrame(list(enumerate(names)),
                               "id long, name string")
    got = {(r.id1, r.id2) for r in
           edit_distance_join(df, "id", "name", max_dist=d,
                              strategy="prefix").collect()}
    assert got == _brute(spark, df, d)


def test_edit_join_prefix_residue_guard_raises(spark):
    """d > 2 keeps the brute-force residue but the pair-count guard
    refuses to go quadratic past short_residue_cap; cap=None accepts
    and stays exact."""
    names = [chr(ord("a") + i % 26) + str(i) for i in range(40)]
    df = spark.createDataFrame(list(enumerate(names)),
                               "id long, name string")
    with pytest.raises(ValueError, match="short_residue_cap"):
        edit_distance_join(df, "id", "name", max_dist=3,
                           strategy="prefix", short_residue_cap=10) \
            .collect()
    got = {(r.id1, r.id2) for r in
           edit_distance_join(df, "id", "name", max_dist=3,
                              strategy="prefix",
                              short_residue_cap=None).collect()}
    assert got == _brute(spark, df, 3)


def test_composite_matches_field_kinds_and_weights(spark):
    from recdb_postgresql_spark.operators.linkage import composite_matches

    rows = [
        (1, "blk", "acme corp intl", "widget", "p1"),
        (2, "blk", "intl acme corp", "widget", "p2"),   # reordered name
        (3, "blk", "zzz completely other", "gadget", "p1"),
        (4, "other", "acme corp intl", "widget", "p1"),  # wrong block
        (5, "blk", None, "widget", "p1"),                # null name -> 0
    ]
    df = spark.createDataFrame(
        rows, "id long, blk string, name string, typ string, ph string")
    got = {(r.id1, r.id2): r.score for r in composite_matches(
        df, F.col("blk"),
        [("name", "token_jaccard", 2.0),
         ("typ", "exact", 1.0),
         ("ph", "exact", 1.0)],
        threshold=0.5).collect()}
    # 1-2: name jaccard 1.0 (order-insensitive), typ 1, ph 0 -> 0.75
    assert got[(1, 2)] == 0.75
    # wrong block never pairs; null field scores 0 (below threshold
    # here: name 0, typ 1, ph 1 -> 0.5 kept at >= 0.5)
    assert (1, 4) not in got
    assert got.get((1, 5)) == 0.5


def test_composite_matches_levenshtein_ratio(spark):
    from recdb_postgresql_spark.operators.linkage import composite_matches

    df = spark.createDataFrame(
        [(1, 1, "kitten"), (2, 1, "sitten"), (3, 1, "xyzzyq")],
        "id long, blk long, name string")
    got = {(r.id1, r.id2): r.score for r in composite_matches(
        df, F.col("blk"), [("name", "levenshtein_ratio", 1.0)],
        threshold=0.6).collect()}
    # lev(kitten, sitten) = 1 over len 6 -> 1 - 1/6
    assert got[(1, 2)] == round(1 - 1 / 6, 6)
    assert (1, 3) not in got


def test_trgm_trigrams_pg_convention(spark):
    from recdb_postgresql_spark.operators.linkage import trgm_trigrams
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("Cat!",), ("a b",), ("",)], ["s"])
    out = [sorted(r[0]) for r in
           df.select(trgm_trigrams(F.col("s"))).collect()]
    # 'cat' padded '  cat ' -> '  c', ' ca', 'cat', 'at '
    assert out[0] == sorted(["  c", " ca", "cat", "at "])
    # two one-letter words, each padded '  a ' -> 3 windows apiece
    assert out[1] == sorted(["  a", " a ", "  b", " b "])
    assert out[2] == []


def test_trgm_similarity_pairs_behavior(spark):
    from recdb_postgresql_spark.operators.linkage import (
        trgm_trigrams, trgm_similarity_pairs)
    from pyspark.sql import functions as F
    rows = [("word", "word"), ("words", "words"), ("zzz", "zzz")]
    df = spark.createDataFrame(rows, ["id", "name"])
    out = {(r["id1"], r["id2"]): r["sim"]
           for r in trgm_similarity_pairs(df, threshold=0.1).collect()}
    # word vs words share 4 of 10 distinct trigrams -> 4/(5+6-4)
    assert ("word", "words") in out
    g1 = set(df.where(F.col("id") == "word")
             .select(trgm_trigrams(F.col("name"))).collect()[0][0])
    g2 = set(df.where(F.col("id") == "words")
             .select(trgm_trigrams(F.col("name"))).collect()[0][0])
    expect = len(g1 & g2) / len(g1 | g2)
    assert abs(out[("word", "words")] - round(expect, 6)) < 1e-9
    # zzz shares nothing with either word
    assert all("zzz" not in k for k in out)
