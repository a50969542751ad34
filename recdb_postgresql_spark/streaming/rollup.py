"""Streaming analytics over the events stream — the Structured
Streaming counterparts of the batch rollup/sessionize queries.

The reference has no streaming surface (SURVEY §1.4); these are the
pipeline extensions a training-data feed needs, expressed with the
built-in streaming operators wherever possible:

- ``hourly_rollup``: watermarked tumbling-window aggregate. Late rows
  inside the watermark update their window; older rows are dropped —
  the streaming form of the batch ``events_hourly_rollup``.
- ``sessionize``: native ``session_window`` (gap-merged), the
  streaming form of the batch lag+running-sum sessionize.
- ``count_milestones``: a custom STATEFUL operator via
  ``applyInPandasWithState`` — emits a row whenever a user's
  cumulative event count crosses a multiple of ``every``; the
  cumulative counter lives in group state across micro-batches.
  This shape (cross-batch per-key state with append output) is not
  expressible with the built-in windowed aggregates.

events.ts arrives normalized to int64 nanos (readers.load_table);
helpers convert to a proper timestamp column for event-time semantics
and also accept sources that already carry a timestamp ts.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """ts -> TIMESTAMP 'etime' (event-time column). Accepts either the
    normalized int64-nanos encoding (readers.load_table) or an already
    typed timestamp/timestamp_ntz source column."""
    dt = events.schema[ts_col].dataType.typeName()
    if dt.startswith("timestamp"):
        return events.withColumn("etime", F.col(ts_col).cast("timestamp"))
    return events.withColumn(
        "etime", F.timestamp_seconds(F.col(ts_col) / F.lit(1_000_000_000)))


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h windows per event_type with late-data handling:
    rows later than ``watermark`` behind the max seen event time are
    dropped, everything else updates its hour bucket. State is bounded
    by (#open windows x #event types)."""
    return (with_event_time(events)
            .withWatermark("etime", watermark)
            .groupBy(F.window("etime", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("hour_start"), "event_type",
                    "n_events", "total_value"))


def sessionize(events: DataFrame, gap: str = "30 minutes",
               watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessions per user via the native session_window:
    windows merge while successive events are within ``gap``. Emitted
    once the watermark passes the session end (append mode)."""
    return (with_event_time(events)
            .withWatermark("etime", watermark)
            .groupBy(F.session_window("etime", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events"))


def dedup_stream(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", ts_col: str = "etime",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming EXACT dedup for a training-data ingest feed: emit each
    distinct content exactly once within the watermark horizon.

    The content key is the same portable 60-bit md5 hash the batch
    ``dedup.exact_duplicates`` groups on, so a stream + batch lambda
    architecture dedups identically. State = one row per distinct hash
    inside the watermark; ``dropDuplicatesWithinWatermark`` expires
    state once the watermark passes, so memory is bounded by the
    ingest-rate x horizon product, not by corpus size — the only way
    exact streaming dedup survives an unbounded feed. (Near-dup LSH at
    stream time would need a bucket-keyed state join; run it in the
    batch layer instead — its candidates need a corpus-wide index.)

    ``docs`` must carry an event-time column ``ts_col`` (use
    ``with_event_time`` for int64-nanos sources)."""
    from recdb_postgresql_spark.functions.hashing import md5_long

    hashed = docs.withColumn("content_hash", md5_long(F.col(text_col)))
    return (hashed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_hash"])
            .select(id_col, "content_hash", ts_col))


MILESTONE_OUTPUT = "user_id long, milestone long"
MILESTONE_STATE = "cnt long"


def _milestone_fn(every: int):
    import pandas as pd

    def fn(key: Any, pdfs: Iterator["pd.DataFrame"], state) -> Iterable["pd.DataFrame"]:
        (user_id,) = key
        (cnt,) = state.get if state.exists else (0,)
        new = sum(len(p) for p in pdfs)
        crossed = list(range((cnt // every + 1) * every, cnt + new + 1, every))
        state.update((cnt + new,))
        if crossed:
            yield pd.DataFrame({"user_id": [user_id] * len(crossed),
                                "milestone": crossed})

    return fn


def count_milestones(events: DataFrame, every: int = 100) -> DataFrame:
    """Emit (user_id, milestone) whenever a user's cumulative event
    count crosses a multiple of ``every``. Cross-batch state = one
    long per user; output mode append — the canonical
    applyInPandasWithState shape for operators the built-in windowed
    aggs can't express."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (events.groupBy("user_id")
            .applyInPandasWithState(_milestone_fn(every),
                                    outputStructType=MILESTONE_OUTPUT,
                                    stateStructType=MILESTONE_STATE,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def trending_items(events: DataFrame, window: str = "1 hour",
                   slide: str = "15 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Sliding-window item popularity — the streaming half of the
    popularity fallback recommender: per (sliding window, item) event
    counts, late data handled by the watermark. Each event lands in
    window/slide overlapping windows (4 here), state is bounded by
    (#open windows x #items). Rank-per-window is left to the sink
    side (a per-window ORDER BY after append emission, or
    ``cf.popularity_topk`` over the materialized counts) — global
    ranking inside an append stream would hold every window open.

    Item = the ``k`` property of the event payload, matching the
    batch recommender's item axis."""
    item = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (with_event_time(events)
            .where(item.isNotNull())
            .withColumn("item", item)
            .withWatermark("etime", watermark)
            .groupBy(F.window("etime", window, slide).alias("w"), "item")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "item", "n_events"))
