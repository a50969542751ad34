"""Real Structured Streaming runs of the rollup/sessionize/stateful
operators (file source, availableNow trigger), verified against batch
equivalents computed on the same rows — the streaming analog of the
DuckDB oracle discipline."""

import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.sources.readers import load_table
from recdb_postgresql_spark.streaming import (count_milestones,
                                              dedup_stream, hourly_rollup,
                                              sessionize)
from recdb_postgresql_spark.streaming.rollup import with_event_time

SF = "/root/testdata/sf0.001"
SCHEMA = ("event_id long, user_id long, event_type string, ts long, "
          "value double, props string")


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream") / "events")
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "ts", "value", "props")
    ev.write.parquet(d)
    return d


def _run_stream(spark, stream_df, ckpt, mode="append"):
    rows = []
    q = (stream_df.writeStream
         .foreachBatch(lambda b, _: rows.extend(b.collect()))
         .outputMode(mode)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return rows


def test_streaming_hourly_rollup_matches_batch(spark, events_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(events_dir)
    got = _run_stream(spark, hourly_rollup(stream), str(tmp_path / "c1"),
                      mode="append")
    batch = (with_event_time(spark.read.schema(SCHEMA).parquet(events_dir))
             .groupBy(F.window("etime", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum("value").alias("total_value"))
             .select(F.col("w.start").alias("hour_start"), "event_type",
                     "n_events", "total_value").collect())
    key = lambda r: (r.hour_start, r.event_type)  # noqa: E731
    got_m = {key(r): (r.n_events, round(r.total_value, 6)) for r in got}
    exp_m = {key(r): (r.n_events, round(r.total_value, 6)) for r in batch}
    # availableNow + watermark: only windows older than the watermark
    # emit in append mode; every emitted window must match batch exactly
    assert got_m, "no windows closed — watermark never advanced"
    for k, v in got_m.items():
        assert exp_m[k] == v
    # and the tail the stream held back is exactly the late window set
    assert set(exp_m) >= set(got_m)


def test_streaming_sessionize_matches_batch_sessions(spark, events_dir,
                                                     tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(events_dir)
    got = _run_stream(spark, sessionize(stream), str(tmp_path / "c2"),
                      mode="append")
    # batch truth: the lag+running-sum sessionizer from the driver suite
    batch = (with_event_time(spark.read.schema(SCHEMA).parquet(events_dir))
             .groupBy(F.session_window("etime", "30 minutes").alias("w"),
                      "user_id")
             .agg(F.count(F.lit(1)).alias("n_events"))
             .select("user_id", F.col("w.start").alias("session_start"),
                     "n_events").collect())
    got_m = {(r.user_id, r.session_start): r.n_events for r in got}
    exp_m = {(r.user_id, r.session_start): r.n_events for r in batch}
    assert got_m, "no sessions emitted"
    for k, v in got_m.items():
        assert exp_m[k] == v


def test_streaming_exact_dedup(spark, tmp_path):
    """Streaming exact dedup: duplicated texts across micro-batches
    collapse to one emission per distinct content (state keyed on the
    same md5 hash the batch dedup groups on)."""
    import datetime

    d = str(tmp_path / "docs")
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, ["alpha text", "beta text", "gamma text"][i % 3],
             base + datetime.timedelta(seconds=i)) for i in range(30)]
    spark.createDataFrame(rows, "doc_id long, text string, etime timestamp") \
        .repartition(3).write.parquet(d)
    stream = (spark.readStream
              .schema("doc_id long, text string, etime timestamp")
              .option("maxFilesPerTrigger", 1).parquet(d))
    got = _run_stream(spark, dedup_stream(stream), str(tmp_path / "c4"))
    # exactly one row per distinct content, hashes match the batch op
    from recdb_postgresql_spark.functions.hashing import md5_long
    batch = {r.h for r in spark.read.parquet(d)
             .select(md5_long(F.col("text")).alias("h")).distinct().collect()}
    assert len(got) == 3
    assert {r.content_hash for r in got} == batch


def test_stateful_milestones_across_microbatches(spark, events_dir,
                                                 tmp_path):
    """State must persist ACROSS micro-batches: maxFilesPerTrigger=1
    forces multiple batches over the same files; milestones must equal
    the batch-computed crossings exactly once each."""
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(events_dir))
    got = _run_stream(spark, count_milestones(stream, every=20),
                      str(tmp_path / "c3"), mode="append")
    counts = {r.user_id: r.cnt for r in
              (spark.read.schema(SCHEMA).parquet(events_dir)
               .groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
               .collect())}
    expected = {(u, m) for u, c in counts.items()
                for m in range(20, c + 1, 20)}
    assert {(r.user_id, r.milestone) for r in got} == expected
    assert len(got) == len(expected)            # no duplicate emissions


def test_streaming_trending_items_matches_batch(spark, events_dir, tmp_path):
    """Sliding-window item counts: every window the stream emits must
    match the batch computation of the same (window, slide) spec."""
    from recdb_postgresql_spark.streaming.rollup import trending_items

    stream = spark.readStream.schema(SCHEMA).parquet(events_dir)
    got = _run_stream(spark, trending_items(stream), str(tmp_path / "ct"),
                      mode="append")
    raw = spark.read.schema(SCHEMA).parquet(events_dir)
    item = F.get_json_object(F.col("props"), "$.k").cast("int")
    batch = (with_event_time(raw)
             .where(item.isNotNull()).withColumn("item", item)
             .groupBy(F.window("etime", "1 hour", "15 minutes").alias("w"),
                      "item")
             .agg(F.count(F.lit(1)).alias("n_events"))
             .select(F.col("w.start").alias("window_start"), "item",
                     "n_events").collect())
    got_m = {(r.window_start, r.item): r.n_events for r in got}
    exp_m = {(r.window_start, r.item): r.n_events for r in batch}
    assert got_m, "no windows closed"
    for k, v in got_m.items():
        assert exp_m[k] == v
    assert set(exp_m) >= set(got_m)
    # each event lands in window/slide = 4 overlapping windows
    assert sum(exp_m.values()) == 4 * raw.where(item.isNotNull()).count()
