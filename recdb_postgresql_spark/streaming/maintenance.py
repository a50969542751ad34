"""Streaming model maintenance — the Spark-native form of RecDB's
INSERT hook (R15).

Reference behavior: every INSERT into a table backing a recommender
bumps ``updatecounter``; when new events reach
``update_threshold x eventtotal`` (default 0.5) the model is retrained
in full and the counter resets (``nodeModifyTable.c:271``,
``recathon.c:960-1203``, threshold logic ``recathon.c:1087-1189``).

Here the event stream is a Structured Streaming source and the hook is
``foreachBatch``: each micro-batch appends to the events store, bumps
the catalog counter, and triggers the same full-retrain policy. The
retrain itself is the batch trainer — models are replaced atomically
via the catalog, so concurrent readers keep the old model until the
swap.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from recdb_postgresql_spark.engine import RecEngine


class StreamingMaintainer:
    """Attach with ``writeStream.foreachBatch(maintainer.on_batch)``.

    For unit tests (no streaming query needed) ``on_batch`` can be
    called directly with a batch DataFrame — the semantics are
    identical, which is the point of foreachBatch.
    """

    def __init__(self, engine: RecEngine, name: str, events: DataFrame,
                 userkey: str, itemkey: str, eventval: str):
        self.engine = engine
        self.name = name
        self.events = events
        self.userkey, self.itemkey, self.eventval = userkey, itemkey, eventval
        self.retrain_count = 0

    def on_batch(self, batch_df: DataFrame, batch_id: Optional[int] = None) -> None:
        info = self.engine.catalog.get(self.name)
        before = (info.event_total, info.update_counter) if info else None
        self.events = self.engine.append_events(
            self.name, self.events, batch_df,
            self.userkey, self.itemkey, self.eventval)
        info = self.engine.catalog.get(self.name)
        if before and info.update_counter == 0 and before[1] > 0:
            self.retrain_count += 1
        elif before and info.event_total > before[0]:
            self.retrain_count += 1
