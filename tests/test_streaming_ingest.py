"""Unbounded-horizon streaming dedup against the persisted hash index
(streaming/ingest.StreamingIndexDeduper): state on disk, not in stream
memory — a duplicate from ANY earlier batch is dropped, and the index
advances with each batch's survivors."""

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import dedup
from recdb_postgresql_spark.streaming import StreamingIndexDeduper

SCHEMA = "doc_id long, text string"


def test_index_deduper_across_batches(spark, tmp_path):
    seed = spark.createDataFrame([(1, "day zero corpus")], SCHEMA)
    dedup.write_hash_index(seed, "ingest_idx", buckets=4)
    ded = StreamingIndexDeduper(spark, "ingest_idx",
                                clean_path=str(tmp_path / "clean"),
                                buckets=4)

    b1 = spark.createDataFrame(
        [(10, "day zero corpus"),     # known from the seed -> dropped
         (11, "fresh one"),           # survives
         (12, "fresh one"),           # intra-batch dup -> dropped
         (13, "fresh two")], SCHEMA)  # survives
    assert {r.doc_id for r in ded.on_batch(b1).collect()} == {11, 13}

    # batch 2 dups against batch 1's survivors (disk state, no
    # watermark horizon) AND the seed; only truly novel content passes
    b2 = spark.createDataFrame(
        [(20, "fresh one"),           # batch-1 survivor -> dropped
         (21, "day zero corpus"),     # seed -> dropped
         (22, "fresh three")], SCHEMA)
    assert {r.doc_id for r in ded.on_batch(b2).collect()} == {22}

    assert (ded.batches, ded.survivor_count) == (2, 3)
    # the clean sink accumulated exactly the survivors
    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert {r.doc_id for r in clean.collect()} == {11, 13, 22}
    # index holds one row per distinct content ever seen
    assert spark.table("ingest_idx").count() == 4
    spark.sql("DROP TABLE ingest_idx")


def test_index_deduper_through_real_stream(spark, tmp_path):
    """The actual wiring: readStream -> foreachBatch(on_batch) with an
    availableNow trigger, same contract as the direct calls."""
    seed = spark.createDataFrame([(1, "already ingested")], SCHEMA)
    dedup.write_hash_index(seed, "ingest_idx_s", buckets=4)
    ded = StreamingIndexDeduper(spark, "ingest_idx_s",
                                clean_path=str(tmp_path / "clean"),
                                buckets=4)
    incoming = tmp_path / "incoming"
    spark.createDataFrame(
        [(30, "already ingested"), (31, "novel stream doc"),
         (32, "novel stream doc")], SCHEMA) \
        .write.parquet(str(incoming))

    q = (spark.readStream.schema(SCHEMA).parquet(str(incoming))
         .writeStream.foreachBatch(ded.on_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert {r.doc_id for r in clean.collect()} == {31}
    assert spark.table("ingest_idx_s").count() == 2
    spark.sql("DROP TABLE ingest_idx_s")


def test_neardup_deduper_across_batches(spark, tmp_path):
    from recdb_postgresql_spark.streaming import StreamingNearDupDeduper

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten eleven"
    for suf in ("_bands", "_sh"):
        spark.sql(f"DROP TABLE IF EXISTS nd_idx{suf}")
    dedup.write_lsh_index(
        spark.createDataFrame([(1, base)], SCHEMA), "nd_idx", buckets=4)
    ded = StreamingNearDupDeduper(spark, "nd_idx",
                                  clean_path=str(tmp_path / "clean"),
                                  buckets=4)

    b1 = spark.createDataFrame(
        [(10, base.replace("kappa", "lambda")),  # near-dups the seed
         (11, other),                            # survives
         (12, other + " twelve"),                # near-dups 11 (greedy)
         (13, "completely different content with no shared trigrams xx")],
        SCHEMA)
    assert {r.doc_id for r in ded.on_batch(b1).collect()} == {11, 13}

    # batch 2: near-dup of a batch-1 SURVIVOR (disk state) is dropped
    b2 = spark.createDataFrame(
        [(20, other),                          # = 11 -> dropped
         (21, "genuinely novel text stream entry never seen before")],
        SCHEMA)
    assert {r.doc_id for r in ded.on_batch(b2).collect()} == {21}
    assert (ded.batches, ded.survivor_count, ded.dropped_count) == (2, 3, 3)
    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert {r.doc_id for r in clean.collect()} == {11, 13, 21}
    for suf in ("_bands", "_sh"):
        spark.sql(f"DROP TABLE nd_idx{suf}")


def test_neardup_deduper_through_real_stream(spark, tmp_path):
    from recdb_postgresql_spark.streaming import StreamingNearDupDeduper

    seed = "the quick brown fox jumps over the lazy dog again today"
    for suf in ("_bands", "_sh"):
        spark.sql(f"DROP TABLE IF EXISTS nd_idx_s{suf}")
    dedup.write_lsh_index(
        spark.createDataFrame([(1, seed)], SCHEMA), "nd_idx_s", buckets=4)
    ded = StreamingNearDupDeduper(spark, "nd_idx_s",
                                  clean_path=str(tmp_path / "clean"),
                                  buckets=4)
    incoming = tmp_path / "incoming"
    spark.createDataFrame(
        [(30, seed.replace("today", "tomorrow")),   # near-dup -> dropped
         (31, "novel streaming document with entirely fresh wording")],
        SCHEMA).write.parquet(str(incoming))

    q = (spark.readStream.schema(SCHEMA).parquet(str(incoming))
         .writeStream.foreachBatch(ded.on_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert {r.doc_id for r in clean.collect()} == {31}
    for suf in ("_bands", "_sh"):
        spark.sql(f"DROP TABLE nd_idx_s{suf}")


def test_streaming_merger_batches_and_real_stream(spark, tmp_path):
    """CDC micro-batches MERGE into an EventStore: last-change-per-key
    collapse inside a batch, tombstones delete, one commit per batch;
    then the same contract through a real availableNow stream."""
    from recdb_postgresql_spark.sources.event_store import EventStore
    from recdb_postgresql_spark.streaming import StreamingMerger

    cdc = ("userid long, itemid long, ratingval double, "
           "seq long, is_del boolean")
    store = EventStore(spark, str(tmp_path / "ev"))
    store.append(spark.createDataFrame(
        [(1, 10, 4.0), (2, 10, 5.0)],
        "userid long, itemid long, ratingval double"))
    merger = StreamingMerger(store, ["userid", "itemid"], seq_col="seq",
                             delete_col="is_del")

    # same key changed twice in one batch: seq order wins, not arrival
    b1 = spark.createDataFrame(
        [(1, 10, 9.0, 2, False), (1, 10, 7.0, 1, False),
         (3, 30, 3.0, 1, False)], cdc)
    merger.on_batch(b1)
    rows = {(r.userid, r.itemid): r.ratingval for r in store.read().collect()}
    assert rows == {(1, 10): 9.0, (2, 10): 5.0, (3, 30): 3.0}

    # update-then-tombstone for one key: the LAST change (tombstone)
    # applies; an empty batch is a no-op commit-wise
    b2 = spark.createDataFrame(
        [(2, 10, 6.0, 1, False), (2, 10, 0.0, 2, True)], cdc)
    merger.on_batch(b2)
    merger.on_batch(spark.createDataFrame([], cdc))
    rows = {(r.userid, r.itemid): r.ratingval for r in store.read().collect()}
    assert rows == {(1, 10): 9.0, (3, 30): 3.0}
    assert merger.batches == 2

    # real stream wiring: one more CDC file applied via foreachBatch
    incoming = tmp_path / "cdc_in"
    spark.createDataFrame([(4, 40, 4.0, 1, False),
                           (1, 10, 0.0, 1, True)], cdc) \
        .write.parquet(str(incoming))
    q = (spark.readStream.schema(cdc).parquet(str(incoming))
         .writeStream.foreachBatch(merger.on_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    rows = {(r.userid, r.itemid): r.ratingval for r in store.read().collect()}
    assert rows == {(3, 30): 3.0, (4, 40): 4.0}


def test_span_scrubber_across_batches(spark, tmp_path):
    """Substring scrubbing across micro-batches: a passage quoted from
    the seeded corpus is CUT (the doc survives, minus the span); a
    batch-2 doc quoting a BATCH-1 survivor's novel text is scrubbed
    against the advanced index."""
    from recdb_postgresql_spark.operators import text as text_ops
    from recdb_postgresql_spark.streaming import StreamingSpanScrubber

    spark.sql("DROP TABLE IF EXISTS span_s_grams")
    seed = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    text_ops.write_span_index(
        spark.createDataFrame([(1, seed)], SCHEMA), "span_s",
        k=3, buckets=4)
    scr = StreamingSpanScrubber(spark, "span_s",
                                clean_path=str(tmp_path / "clean"),
                                k=3, min_span=5, buckets=4)

    novel = "one two three four five six seven eight nine ten"
    b1 = spark.createDataFrame(
        [(10, "intro alpha beta gamma delta epsilon outro words here"),
         (11, novel)], SCHEMA)
    out1 = {r.doc_id: (r.text, r.n_removed)
            for r in scr.on_batch(b1).collect()}
    assert out1[10] == ("intro outro words here", 5)
    assert out1[11] == (novel, 0)

    b2 = spark.createDataFrame(
        [(20, "quoting one two three four five six now")], SCHEMA)
    out2 = {r.doc_id: (r.text, r.n_removed)
            for r in scr.on_batch(b2).collect()}
    assert out2[20] == ("quoting now", 6)
    assert (scr.batches, scr.scrubbed_docs, scr.words_removed) == (2, 2, 11)
    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert {r.doc_id for r in clean.collect()} == {10, 11, 20}
    spark.sql("DROP TABLE span_s_grams")


def test_span_scrubber_through_real_stream(spark, tmp_path):
    from recdb_postgresql_spark.operators import text as text_ops
    from recdb_postgresql_spark.streaming import StreamingSpanScrubber

    spark.sql("DROP TABLE IF EXISTS span_ss_grams")
    seed = "the quick brown fox jumps over the lazy dog again"
    text_ops.write_span_index(
        spark.createDataFrame([(1, seed)], SCHEMA), "span_ss",
        k=3, buckets=4)
    scr = StreamingSpanScrubber(spark, "span_ss",
                                clean_path=str(tmp_path / "clean"),
                                k=3, min_span=5, buckets=4)
    incoming = tmp_path / "incoming"
    spark.createDataFrame(
        [(30, "prefix the quick brown fox jumps suffix stays")],
        SCHEMA).write.parquet(str(incoming))

    q = (spark.readStream.schema(SCHEMA).parquet(str(incoming))
         .writeStream.foreachBatch(scr.on_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    clean = {r.doc_id: r.text for r in
             spark.read.parquet(str(tmp_path / "clean")).collect()}
    assert clean == {30: "prefix suffix stays"}
    spark.sql("DROP TABLE span_ss_grams")


def test_span_scrubber_intra_batch_pair(spark, tmp_path):
    """ADVICE r8: a passage duplicated between two docs arriving in
    the SAME micro-batch must be scrubbed too (keep-first by id) —
    and only the clean copy's grams enter the index, so a later
    batch still scrubs against the kept copy."""
    from recdb_postgresql_spark.operators import text as text_ops
    from recdb_postgresql_spark.streaming import StreamingSpanScrubber

    import shutil
    spark.sql("DROP TABLE IF EXISTS span_ib_grams")
    shutil.rmtree("spark-warehouse/span_ib_grams", ignore_errors=True)
    text_ops.write_span_index(
        spark.createDataFrame([], SCHEMA), "span_ib", k=3, buckets=4)
    scr = StreamingSpanScrubber(spark, "span_ib", k=3, min_span=5,
                                buckets=4)
    shared = "red orange yellow green blue indigo"
    b1 = spark.createDataFrame(
        [(40, f"first {shared} alpha one"),
         (41, f"second {shared} omega two")], SCHEMA)
    out1 = {r.doc_id: (r.text, r.n_removed)
            for r in scr.on_batch(b1).collect()}
    assert out1[40] == (f"first {shared} alpha one", 0)  # keep-first
    assert out1[41] == ("second omega two", 6)
    # the kept copy is indexed: a later batch scrubs against it
    b2 = spark.createDataFrame([(50, f"later {shared} ending")], SCHEMA)
    out2 = {r.doc_id: (r.text, r.n_removed)
            for r in scr.on_batch(b2).collect()}
    assert out2[50] == ("later ending", 6)
    spark.sql("DROP TABLE span_ib_grams")


def test_streaming_drift_monitor(spark, tmp_path):
    """Frozen-baseline PSI per batch: a same-distribution batch stays
    under the watch level, a shifted batch crosses the action
    threshold and alerts; a batch's score equals the batch's
    psi_drift row-sum (shared convention); real readStream drive."""
    from recdb_postgresql_spark.operators import profile
    from recdb_postgresql_spark.streaming.ingest import (
        StreamingDriftMonitor,
    )

    base = spark.createDataFrame(
        [(float(i % 100),) for i in range(2000)], "value double")
    mon = StreamingDriftMonitor(spark, base, bins=10,
                                alert_threshold=0.25)

    same = spark.createDataFrame(
        [(float((i * 7) % 100),) for i in range(500)], "value double")
    r1 = mon.on_batch(same, batch_id=0)
    assert r1["n_rows"] == 500 and not r1["alert"] and r1["psi"] < 0.1

    shifted = spark.createDataFrame(
        [(float(i % 100) + 70.0,) for i in range(500)], "value double")
    r2 = mon.on_batch(shifted, batch_id=1)
    assert r2["alert"] and r2["psi"] > 0.25

    # convention parity: the monitor's score == SUM(psi_term) of the
    # batch operator over the same baseline/batch
    op_total = sum(r["psi_term"] for r in
                   profile.psi_drift(base, shifted, bins=10).collect())
    # op rounds each of 10 psi_terms to 6dp before this sum
    assert abs(r2["psi"] - op_total) <= 10 * 5e-7

    # drive through a REAL stream: two parquet batches, foreachBatch
    src = str(tmp_path / "src")
    same.write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("value double").parquet(src))
    q = (stream.writeStream.trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .foreachBatch(lambda df, bid: mon.on_batch(df, bid))
         .start())
    q.awaitTermination(120)
    assert len(mon.history) >= 3 and mon.history[-1]["n_rows"] == 500


def test_streaming_distinct_monitor(spark, tmp_path):
    """HLL-state distinct monitor: totals grow with genuinely new
    keys, replayed batches change NOTHING (merge-by-MAX idempotence),
    and the running estimate matches the batch operator's estimate
    over the union; then the same contract through a real
    availableNow stream."""
    from recdb_postgresql_spark.functions import sketch
    from recdb_postgresql_spark.streaming.ingest import (
        StreamingDistinctMonitor,
    )

    mon = StreamingDistinctMonitor(spark, key_col="user_id", b=10)
    b1 = spark.createDataFrame(
        [(i,) for i in range(500)], "user_id long")
    b2 = spark.createDataFrame(
        [(i,) for i in range(400, 900)], "user_id long")
    r1 = mon.on_batch(b1, 0)
    r2 = mon.on_batch(b2, 1)
    assert r2["est_total_distinct"] > r1["est_total_distinct"]
    # ~400 new keys in batch 2 (100 overlap); HLL b=10 -> ~3% error
    assert 250 < r2["est_new_distinct"] < 550
    # replaying batch 2 is a no-op on the registers
    r3 = mon.on_batch(b2, 1)
    assert r3["est_total_distinct"] == r2["est_total_distinct"]
    assert r3["est_new_distinct"] == 0.0
    # running estimate == batch-operator estimate over the union
    union_est = sketch.hll_estimate(
        sketch.hll_build(b1.unionByName(b2), "user_id", b=10),
        b=10).collect()[0]["est_distinct"]
    assert abs(r2["est_total_distinct"] - union_est) < 0.01

    # real stream drive
    incoming = tmp_path / "in"
    incoming.mkdir()
    b1.write.parquet(str(incoming / "batch1"))
    mon2 = StreamingDistinctMonitor(spark, key_col="user_id", b=10)
    q = (spark.readStream.schema("user_id long")
         .parquet(str(incoming / "*"))
         .writeStream
         .foreachBatch(lambda df, bid: mon2.on_batch(df, bid))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    assert mon2.history and \
        abs(mon2.history[-1]["est_total_distinct"]
            - r1["est_total_distinct"]) < 0.01


def test_streaming_heavy_hitters_monitor(spark, tmp_path):
    """MG-state top-talkers monitor: the planted dominant key leads
    the running top list across batches, counters never exceed k, and
    the same contract holds through a real availableNow stream."""
    from recdb_postgresql_spark.streaming.ingest import (
        StreamingHeavyHittersMonitor,
    )

    mon = StreamingHeavyHittersMonitor(spark, key_col="user_id", k=16)
    b1 = spark.createDataFrame(
        [("hot",)] * 300 + [(f"t{i}",) for i in range(400)],
        "user_id string")
    b2 = spark.createDataFrame(
        [("hot",)] * 200 + [("warm",)] * 150
        + [(f"u{i}",) for i in range(300)], "user_id string")
    r1 = mon.on_batch(b1, 0)
    r2 = mon.on_batch(b2, 1)
    assert r1["top"][0]["key"] == "hot"
    assert r2["top"][0]["key"] == "hot"
    assert {e["key"] for e in r2["top"][:2]} == {"hot", "warm"}
    assert len(mon._counters) <= 16
    assert r2["total_rows"] == 700 + 650
    # guarantee direction: estimate never exceeds the true count
    true_hot = 500
    assert r2["top"][0]["est_count"] <= true_hot

    # real stream drive
    incoming = tmp_path / "in"
    incoming.mkdir()
    b1.write.parquet(str(incoming / "batch1"))
    mon2 = StreamingHeavyHittersMonitor(spark, key_col="user_id", k=16)
    q = (spark.readStream.schema("user_id string")
         .parquet(str(incoming / "*"))
         .writeStream
         .foreachBatch(lambda df, bid: mon2.on_batch(df, bid))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    assert mon2.history and mon2.history[-1]["top"][0]["key"] == "hot"


def test_streaming_quantile_monitor(spark, tmp_path):
    """DDQ-state quantile monitor: running estimates honor the 6.25%
    relative-error guarantee vs the exact union quantiles, state
    merges by count addition, and the contract holds through a real
    availableNow stream."""
    from recdb_postgresql_spark.streaming.ingest import (
        StreamingQuantileMonitor,
    )

    mon = StreamingQuantileMonitor(spark, val_col="v",
                                   ps=(0.5, 0.99))
    b1 = spark.createDataFrame([(float(i),) for i in range(1, 1001)],
                               "v double")
    b2 = spark.createDataFrame([(float(i),) for i in range(2000, 4001)],
                               "v double")
    r1 = mon.on_batch(b1, 0)
    assert r1["n_total"] == 1000
    assert abs(r1["p50"] / 500 - 1) < 0.0625 + 1e-3
    r2 = mon.on_batch(b2, 1)
    assert r2["n_total"] == 3001
    # union: 1..1000 + 2000..4000 -> p50 is the 1501st value = 2500
    assert abs(r2["p50"] / 2500 - 1) < 0.0625 + 1e-3
    assert abs(r2["p99"] / 3970 - 1) < 0.0625 + 1e-3

    # real stream drive
    incoming = tmp_path / "qin"
    incoming.mkdir()
    b1.write.parquet(str(incoming / "b1"))
    mon2 = StreamingQuantileMonitor(spark, val_col="v", ps=(0.5,))
    stream = (spark.readStream.schema("v double")
              .parquet(str(incoming) + "/*"))
    q = (mon2.attach(stream)
         .option("checkpointLocation", str(tmp_path / "qck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert mon2.history and mon2.history[-1]["n_total"] == 1000
    assert abs(mon2.history[-1]["p50"] / 500 - 1) < 0.0625 + 1e-3
