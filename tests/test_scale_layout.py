"""Scale layout assertions: bucketed joins skip the shuffle, salted
joins preserve results."""

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.functions.skew import salted_join
from recdb_postgresql_spark.sources.readers import load_table
from recdb_postgresql_spark.sources.sinks import write_bucketed


def test_bucketed_join_no_shuffle(spark):
    # uses the session's default warehouse dir (spark-warehouse/, gitignored)
    ev = load_table(spark, "/root/testdata/sf0.001", "events") \
        .select("user_id", "event_type", "value")
    write_bucketed(ev, "ev_bucketed", "user_id", buckets=8)
    t = spark.table("ev_bucketed")
    # self-aggregate + self-join on the bucket key: bucketed side needs
    # no Exchange before the join
    agg = t.groupBy("user_id").agg(F.sum("value").alias("total"))
    joined = t.join(agg, "user_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert joined.count() == ev.count()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    spark.sql("DROP TABLE ev_bucketed")


def test_ivf_cells_persist_as_bucketed_layout(spark):
    """The 100 TB shape of the IVF near-dup/ANN index: persist the
    (vector, cell) assignment bucketed BY CELL, and the within-cell
    pair self-join — the expensive step of embedding_neardup_ivf —
    runs with no Exchange at all (bucket files are the partitions).
    Results must equal the on-the-fly operator's."""
    from recdb_postgresql_spark.operators import dedup, similarity

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = similarity.first_k_centroids(emb, k=8)
    assign = similarity.ivf_assign(emb, cents)
    write_bucketed(emb.join(assign, "vec_id"), "emb_cells", "cell",
                   buckets=8, sort=False)
    t = spark.table("emb_cells")
    a = t.select(F.col("vec_id").alias("id1"), "cell",
                 F.col("embedding").alias("v1"))
    b = t.select(F.col("vec_id").alias("id2"), F.col("cell").alias("cell2"),
                 F.col("embedding").alias("v2"))
    pairs = a.join(b, (F.col("cell") == F.col("cell2"))
                   & (F.col("id1") < F.col("id2")))
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    # same pair set as the on-the-fly operator (cos column aside)
    from pyspark.sql import functions as SF
    got = {(r.id1, r.id2) for r in pairs.select("id1", "id2").collect()}
    ref = {(r.id1, r.id2) for r in dedup.embedding_near_duplicates_ivf(
        emb, cents, threshold=-2.0).select("id1", "id2").collect()}
    assert got == ref and got
    spark.sql("DROP TABLE emb_cells")


def test_salted_join_equivalent(spark):
    left = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, i) for i in range(5)],
        "k long, v long")
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")],
                                  "k long, name string")
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", salt=4)
    p = sorted((r.k, r.v, r.name) for r in plain.collect())
    s = sorted((r.k, r.v, r.name) for r in salted.collect())
    assert p == s and len(p) == 55


def test_ivf_index_partition_pruning(spark, tmp_path):
    """write_ivf_index + ivf_topk_indexed: the persisted cell layout
    must (a) return the exact same top-k as in-memory ivf_topk and
    (b) PRUNE — the scan's partition filter keeps only the probed
    cells, so unprobed cell directories are never read."""
    from recdb_postgresql_spark.operators import similarity
    from recdb_postgresql_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = similarity.first_k_centroids(emb, k=8)
    path = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(emb, cents, path)

    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = similarity.ivf_topk_indexed(spark, path, qs, cents, k=5, nprobe=2)
    mem = similarity.ivf_topk(emb, qs, cents, k=5, nprobe=2)
    got = sorted((r.qid, r.vec_id, r.cos, r.rank) for r in out.collect())
    want = sorted((r.qid, r.vec_id, r.cos, r.rank) for r in mem.collect())
    assert got == want and got

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # at most 3 queries x 2 probes distinct cells survive the filter
    import re
    m = re.search(r"cell#\d+ IN \(([^)]*)\)", plan)
    assert m, plan[:1500]
    assert len(m.group(1).split(",")) <= 6


def test_incremental_dedup_against_hash_index(spark):
    """Cross-batch exact dedup: batch 2 drops content already indexed
    from batch 1 AND intra-batch dups, and the probe join reads the
    bucketed index with no Exchange on the index side."""
    from recdb_postgresql_spark.operators import dedup

    b1 = spark.createDataFrame(
        [(1, "seen text one"), (2, "seen text two")],
        "doc_id long, text string")
    dedup.write_hash_index(b1, "dedup_idx", buckets=4)
    b2 = spark.createDataFrame(
        [(10, "seen text one"),       # known from batch 1 -> dropped
         (11, "brand new text"),      # survives
         (12, "brand new text"),      # intra-batch dup -> dropped
         (13, "another new one")],    # survives
        "doc_id long, text string")
    out = dedup.dedup_against_index(b2, spark, "dedup_idx")
    assert {r.doc_id for r in out.collect()} == {11, 13}

    plan = out._jdf.queryExecution().executedPlan().toString()
    # the index side must be a bucket-aware scan (pre-partitioned read,
    # no Exchange needed to align with the join key)
    assert "SelectedBucketsCount" in plan, plan[:2000]
    spark.sql("DROP TABLE dedup_idx")


def test_incremental_neardup_against_lsh_index(spark):
    """Cross-batch NEAR-dup probe: a batch doc whose text is a slight
    edit of an indexed doc is flagged with its true Jaccard, the
    band-sig candidate join reads the bucketed index with no Exchange
    on the index side, and append_lsh_index advances the state so a
    re-probe of the same content then matches."""
    from recdb_postgresql_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b1 = spark.createDataFrame(
        [(1, base), (2, "totally different words entirely here now ok")],
        "doc_id long, text string")
    for suf in ("_bands", "_sh"):
        spark.sql(f"DROP TABLE IF EXISTS lsh_t{suf}")
    dedup.write_lsh_index(b1, "lsh_t", buckets=4)
    b2 = spark.createDataFrame(
        [(10, base),                               # exact copy -> j=1.0
         (11, base.replace("kappa", "lambda")),    # near dup
         (12, "fresh unseen content with no overlap at all whatsoever")],
        "doc_id long, text string")
    out = dedup.neardup_against_index(b2, spark, "lsh_t", threshold=0.5)
    rows = {(r.new_id, r.idx_id): r.jaccard for r in out.collect()}
    assert rows[(10, 1)] == 1.0
    assert (11, 1) in rows and 0.5 <= rows[(11, 1)] < 1.0
    assert not any(nid == 12 for nid, _ in rows)

    plan = out._jdf.queryExecution().executedPlan().toString()
    # both index tables must read bucket-aware (no index-side Exchange)
    assert plan.count("SelectedBucketsCount") >= 2, plan[:3000]

    # advance the index with the batch's survivor, then re-probe: the
    # previously-unseen content now matches
    dedup.append_lsh_index(
        b2.where(b2.doc_id == 12), "lsh_t", buckets=4)
    b3 = spark.createDataFrame(
        [(20, "fresh unseen content with no overlap at all whatsoever")],
        "doc_id long, text string")
    out3 = dedup.neardup_against_index(b3, spark, "lsh_t", threshold=0.5)
    assert {(r.new_id, r.idx_id, r.jaccard) for r in out3.collect()} \
        == {(20, 12, 1.0)}
    for suf in ("_bands", "_sh"):
        spark.sql(f"DROP TABLE lsh_t{suf}")


def test_bucketed_window_no_shuffle(spark):
    """The storage half of the temporal-operator story: a per-key
    window (sessionize / resample carry / pack cumsum) over a table
    bucketed on that key needs NO Exchange — the bucketed scan already
    satisfies the window's hashpartitioning requirement, so at 100 TB
    the sort is the only per-task cost and the shuffle disappears into
    the write-time layout (sources/sinks.write_bucketed)."""
    from pyspark.sql import Window, functions as F

    df = spark.range(1000).select(
        (F.col("id") % 50).alias("user_id"), F.col("id").alias("ts"),
        (F.col("id") % 7).alias("v"))
    df.write.mode("overwrite").bucketBy(8, "user_id") \
        .sortBy("user_id", "ts").format("parquet") \
        .saveAsTable("bucketed_events_win")
    try:
        t = spark.table("bucketed_events_win")
        w = (Window.partitionBy("user_id").orderBy("ts")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = t.select("user_id", "ts", F.sum("v").over(w).alias("s"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        assert "Bucketed: true" in plan
        # and it computes the right thing, not just the right plan
        got = {(r.user_id, r.ts): r.s for r in out.collect()}
        assert got[(0, 0)] == 0 and got[(0, 50)] == 0 + 1
    finally:
        spark.sql("DROP TABLE bucketed_events_win")


def test_zorder_layout_bounds_all_dims(spark, tmp_path):
    """The data-skipping claim, checked in the parquet footers: with a
    z-ordered write, EVERY file's min/max range is narrow in BOTH
    interleaved columns (so predicates on either column skip files);
    with a plain single-column sort, the second column spans ~its full
    range in every file and nothing can be skipped for it."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from recdb_postgresql_spark.sources import sinks

    n = 100_000
    df = spark.range(n).select(
        (F.col("id") % 317).alias("x"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(317))).alias("y"))

    def extents(path, col_names):
        spans = {c: [] for c in col_names}
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            schema_names = md.schema.names
            los = {c: None for c in col_names}
            his = {c: None for c in col_names}
            for rg in range(md.num_row_groups):
                for j, c in enumerate(schema_names):
                    if c not in col_names:
                        continue
                    st = md.row_group(rg).column(j).statistics
                    los[c] = st.min if los[c] is None else min(los[c], st.min)
                    his[c] = st.max if his[c] is None else max(his[c], st.max)
            for c in col_names:
                spans[c].append((his[c] - los[c]) / 316.0)
        return {c: sum(v) / len(v) for c, v in spans.items()}

    zpath = str(tmp_path / "z")
    sinks.write_zordered(df, zpath, ["x", "y"], bits=9, num_files=32)
    ze = extents(zpath, ["x", "y"])
    assert ze["x"] < 0.5 and ze["y"] < 0.5, ze

    lpath = str(tmp_path / "linear")
    (df.repartitionByRange(32, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(lpath))
    le = extents(lpath, ["x", "y"])
    assert le["x"] < 0.2, le            # sorted dim is tight...
    assert le["y"] > 0.8, le            # ...but the other dim is useless
    # and the z-ordered data is the same rows
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.agg(F.sum("x"), F.sum("y")).collect() == \
        df.agg(F.sum("x"), F.sum("y")).collect()


def test_orc_and_zstd_roundtrip(spark, tmp_path):
    """Format coverage beyond parquet/CSV/JSONL: ORC round-trips the
    documents table losslessly, and zstd-compressed parquet (the
    modern default codec for cold corpora) round-trips identically."""
    from recdb_postgresql_spark.sources.readers import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    orig = {tuple(r) for r in docs.collect()}

    orc = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(orc)
    assert {tuple(r) for r in spark.read.orc(orc)
            .select(*docs.columns).collect()} == orig

    zst = str(tmp_path / "docs_zstd")
    docs.write.mode("overwrite").option("compression", "zstd").parquet(zst)
    assert {tuple(r) for r in spark.read.parquet(zst)
            .select(*docs.columns).collect()} == orig
    import glob
    assert glob.glob(f"{zst}/*.zstd.parquet")     # codec actually applied


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Corpus drops evolve: a later batch adds a column. mergeSchema
    reads the union schema with nulls for the old files — no rewrite
    of historical data."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "doc_id long, text string") \
        .write.parquet(base + "/b1")
    spark.createDataFrame([(2, "b", "en")],
                          "doc_id long, text string, lang string") \
        .write.parquet(base + "/b2")
    df = spark.read.option("mergeSchema", "true") \
        .parquet(base + "/b1", base + "/b2")
    assert set(df.columns) == {"doc_id", "text", "lang"}
    rows = {r.doc_id: r.lang for r in df.collect()}
    assert rows == {1: None, 2: "en"}


def test_ivf_index_append_serves_new_vectors_still_pruned(spark, tmp_path):
    """append_ivf_index advances the partitioned layout in place: a
    probe finds the appended vector without a rebuild, and unprobed
    cell directories are still pruned from the scan."""
    from recdb_postgresql_spark.operators import similarity

    emb = spark.createDataFrame(
        [(i, [float(i % 4), 1.0, 0.0]) for i in range(20)],
        "vec_id long, embedding array<double>")
    cents = similarity.first_k_centroids(emb, k=4)
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(emb, cents, path)

    new = spark.createDataFrame([(100, [0.0, 1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    similarity.append_ivf_index(new, cents, path)

    qs = spark.createDataFrame([(999, [0.0, 1.0, 0.0])],
                               "qid long, qvec array<double>")
    out = similarity.ivf_topk_indexed(spark, path, qs, cents, k=30)
    ids = {r.vec_id for r in out.collect()}
    assert 100 in ids  # the appended vector is served
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # pruning survives the append


def test_span_index_probe_no_index_side_exchange(spark, tmp_path):
    """The persisted positional-gram index is bucketed on gram: a
    probing batch's span join must read it without an index-side
    Exchange, and appends under the same bucket spec stay probeable."""
    import shutil

    from recdb_postgresql_spark.operators import text

    wh = spark.conf.get("spark.sql.warehouse.dir")
    for pre in ("file://", "file:"):
        if wh.startswith(pre):
            wh = wh[len(pre):]
    spark.sql("DROP TABLE IF EXISTS span_t_grams")
    shutil.rmtree(wh + "/span_t_grams", ignore_errors=True)
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "totally different words here nothing shared at all")],
        "doc_id long, text string")
    text.write_span_index(corpus, "span_t", k=3)
    batch = spark.createDataFrame(
        [(100, "xx alpha beta gamma delta epsilon zeta yy")],
        "doc_id long, text string")
    out = text.spans_against_index(batch, spark, "span_t", k=3,
                                   min_span=5)
    rows = {(r.new_id, r.idx_id, r.start_new, r.start_idx, r.span_words)
            for r in out.collect()}
    assert rows == {(100, 1, 2, 1, 6)}
    # the index side of the gram join carries no Exchange; the probe
    # plan scans the bucketed table directly
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_part = plan[plan.index("span_t_grams"):]
    assert "SelectedBucketsCount" in plan or "Exchange" not in scan_part
    # append a doc, reprobe finds spans against it too
    text.append_span_index(spark.createDataFrame(
        [(3, "qq alpha beta gamma delta epsilon rr")],
        "doc_id long, text string"), "span_t", k=3)
    again = {(r.new_id, r.idx_id) for r in
             text.spans_against_index(batch, spark, "span_t", k=3,
                                      min_span=5).collect()}
    assert (100, 3) in again and (100, 1) in again


def test_zorder_layout_narrows_both_dims(spark, tmp_path):
    """Z-ordered files have NARROW min/max footprints on BOTH
    dimensions (verified from the parquet footers via pyarrow), where
    a linear sort is narrow only on its leading key — the property
    row-group pruning depends on. Also: schema unchanged, all rows
    survive, same file count."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from recdb_postgresql_spark.functions import layout

    n = 40_000
    # a true 200x200 grid: x and y independent and uniform
    df = (spark.range(n)
          .select((F.col("id") % 200).cast("double").alias("x"),
                  F.floor(F.col("id") / 200).cast("double").alias("y"),
                  F.col("id").alias("payload")))

    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    n_files = 16
    layout.write_zordered(df, zpath, ["x", "y"], n_files=n_files)
    (df.repartitionByRange(n_files, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(lpath))

    def span_fractions(path):
        import glob
        out = []
        for f in sorted(glob.glob(path + "/*.parquet")):
            md = pq.read_metadata(f)
            lo_x = hi_x = lo_y = hi_y = None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name not in ("x", "y") or col.statistics is None:
                        continue
                    mn, mx = col.statistics.min, col.statistics.max
                    if name == "x":
                        lo_x = mn if lo_x is None else min(lo_x, mn)
                        hi_x = mx if hi_x is None else max(hi_x, mx)
                    else:
                        lo_y = mn if lo_y is None else min(lo_y, mn)
                        hi_y = mx if hi_y is None else max(hi_y, mx)
            if lo_x is not None and lo_y is not None:
                out.append(((hi_x - lo_x) / 199.0, (hi_y - lo_y) / 199.0))
        return out

    zs = span_fractions(zpath)
    ls = span_fractions(lpath)
    assert len(zs) == n_files and len(ls) == n_files
    # Z-order's win is BOUNDED per-dim spans: every dimension stays
    # prunable (a 4x4 tiling -> ~0.25 each), where the linear sort is
    # narrow on x only and y spans the full range in every file
    z_x = sum(a for a, _ in zs) / len(zs)
    z_y = sum(b for _, b in zs) / len(zs)
    l_y = sum(b for _, b in ls) / len(ls)
    assert z_x < 0.6 and z_y < 0.6, (z_x, z_y)
    assert l_y > 0.9, l_y
    # simulated row-group pruning for a predicate on the NON-leading
    # dim (y BETWEEN 50 AND 60): the z-ordered layout skips most
    # files, the linear layout can skip none
    def hit(path):
        import glob
        import pyarrow.parquet as pq2
        n_hit = 0
        for f in sorted(glob.glob(path + "/*.parquet")):
            md = pq2.read_metadata(f)
            lo_y = hi_y = None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema != "y" or col.statistics is None:
                        continue
                    mn, mx = col.statistics.min, col.statistics.max
                    lo_y = mn if lo_y is None else min(lo_y, mn)
                    hi_y = mx if hi_y is None else max(hi_y, mx)
            if lo_y is not None and not (hi_y < 50 or lo_y > 60):
                n_hit += 1
        return n_hit

    assert hit(zpath) <= n_files // 2 < hit(lpath), \
        (hit(zpath), hit(lpath))

    got = spark.read.parquet(zpath)
    assert got.columns == ["x", "y", "payload"]
    assert got.count() == n


def test_bucketed_edges_remove_pagerank_round_exchange(spark):
    """The '100x knob' SCALING.md promises for iterative graph
    algorithms, demonstrated: with the edge list BUCKETED on the
    source node, the per-round frontier join reads the edge side with
    ZERO Exchange — only the (node, double) rank rows move. This is
    one round's join shape (the thing that repeats 6-10x per run)."""
    from pyspark.sql import functions as F

    import shutil

    edges = spark.range(20000).select(
        (F.col("id") % 500).alias("u"),
        ((F.col("id") * 7 + 3) % 500).alias("v"))
    # a stale dir from a crashed run blocks saveAsTable on a fresh
    # session (LOCATION_ALREADY_EXISTS) — pre-clean both halves
    spark.sql("DROP TABLE IF EXISTS pr_edges")
    shutil.rmtree("spark-warehouse/pr_edges", ignore_errors=True)
    write_bucketed(edges, "pr_edges", "u", buckets=8)
    e = spark.table("pr_edges")
    ranks = spark.range(500).select(F.col("id").alias("u"),
                                    F.lit(1.0 / 500).alias("rank"))
    contrib = (e.join(ranks.repartition(8, "u"), "u")
               .groupBy("v").agg(F.sum("rank").alias("c")))
    plan = contrib._jdf.queryExecution().executedPlan().toString()
    scan_side = plan[plan.find("FileScan parquet"):]
    before_scan = plan[:plan.find("FileScan parquet")]
    # the bucketed scan itself is never re-exchanged: SMJ/SHJ reads it
    # straight from the bucket layout
    assert "Exchange hashpartitioning(u" not in scan_side.split(
        "FileScan")[0]
    assert "Bucketed: true" in plan
    # and the result is right
    assert contrib.count() == 500
    spark.sql("DROP TABLE pr_edges")


def test_dynamic_partition_pruning_on_day_partitions(spark, tmp_path):
    """Dynamic partition pruning: a fact table PARTITIONED by day,
    joined to a dimension filtered at runtime — Catalyst injects a
    dynamicpruning predicate so only the dimension's surviving days
    are ever listed/scanned (the date-dim join every 100 TB warehouse
    layout leans on)."""
    from pyspark.sql import functions as F

    fact = spark.range(50000).select(
        (F.col("id") % 30).alias("day"), F.col("id").alias("x"))
    path = str(tmp_path / "fact_by_day")
    fact.write.mode("overwrite").partitionBy("day").parquet(path)
    f = spark.read.parquet(path)
    dim = (spark.range(30).select(F.col("id").alias("day"),
                                  (F.col("id") % 10).alias("cat")))
    joined = (f.join(dim.where(F.col("cat") == 3), "day")
              .agg(F.sum("x").alias("s")))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # correctness: only days 3, 13, 23 survive
    expect = sum(x for x in range(50000) if x % 30 in (3, 13, 23))
    assert joined.collect()[0]["s"] == expect


def test_rendezvous_minimal_movement_and_balance(spark):
    from pyspark.sql import functions as F

    from recdb_postgresql_spark.functions.layout import rendezvous_shard

    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    a = df.select(rendezvous_shard(F.col("k"), 8).alias("s8"),
                  rendezvous_shard(F.col("k"), 9).alias("s9"))
    moved = a.where(F.col("s8") != F.col("s9"))
    n_moved = moved.count()
    # expected 1/9 of keys move; allow wide tolerance
    assert 2000 / 9 * 0.6 < n_moved < 2000 / 9 * 1.6
    # HRW invariant: every moved key lands on the NEW shard
    assert moved.where(F.col("s9") != 8).count() == 0
    # stayers keep their shard id verbatim (no renumbering)
    assert a.where((F.col("s8") == F.col("s9"))
                   & (F.col("s8") >= 8)).count() == 0
    # balance: each of 8 shards holds ~250 keys
    sizes = [r["n"] for r in a.groupBy("s8")
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(sizes) == 8 and min(sizes) > 150 and max(sizes) < 350
