"""Streaming training-data ingest: unbounded-horizon exact dedup
against the persisted hash index.

``rollup.dedup_stream`` handles the in-flight case — state lives in
the streaming engine, bounded by the watermark horizon, so a duplicate
arriving a week later passes through. A corpus ingest pipeline needs
the OTHER contract: a content seen in ANY earlier batch is a
duplicate, forever. That state can't live in stream memory at 100 TB;
it lives on disk as the bucketed hash index
(``dedup.write_hash_index`` — billions of 16-byte rows that never
shuffle), and each micro-batch anti-joins against it through
``foreachBatch``.

Per batch: survivors = ``dedup_against_index`` (intra-batch dups
collapse too), optionally appended to a clean-corpus parquet sink,
then their hashes appended to the index with the same bucket layout
(``dedup.append_hash_index``) so the NEXT batch dedups against them.
The survivor frame is materialized (localCheckpoint) before the index
append — both writes must see the pre-append index state, not
re-evaluate against their own output.

Exactly-once caveat (same as every foreachBatch sink pair): a batch
that crashes between the corpus write and the index append is
re-delivered by checkpoint recovery, and the corpus sink would see its
rows twice. The index append is idempotent-by-content (re-appending
the same hashes only wastes space on the min-id rows); a production
corpus sink makes the pair atomic by writing batch-id-named files —
kept out of this class for clarity.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from recdb_postgresql_spark.functions.hashing import md5_long
from recdb_postgresql_spark.operators.dedup import (append_hash_index,
                                                    dedup_against_index)


class StreamingIndexDeduper:
    """Attach with ``writeStream.foreachBatch(deduper.on_batch)``;
    ``on_batch`` also works called directly with a batch DataFrame
    (foreachBatch's point — the batch path IS the streaming path).

    Requires the index table to exist (seed it with
    ``dedup.write_hash_index``, possibly on an empty frame)."""

    def __init__(self, spark: SparkSession, index_table: str,
                 clean_path: Optional[str] = None,
                 id_col: str = "doc_id", text_col: str = "text",
                 hash_fn=md5_long, buckets: int = 32):
        self.spark = spark
        self.index_table = index_table
        self.clean_path = clean_path
        self.id_col, self.text_col = id_col, text_col
        self.hash_fn = hash_fn
        self.buckets = buckets
        self.batches = 0
        self.survivor_count = 0

    def on_batch(self, batch_df: DataFrame,
                 batch_id: Optional[int] = None) -> DataFrame:
        survivors = dedup_against_index(
            batch_df, self.spark, self.index_table,
            id_col=self.id_col, text_col=self.text_col,
            hash_fn=self.hash_fn).localCheckpoint()
        if self.clean_path:
            (survivors.drop("content_hash").write.mode("append")
             .parquet(self.clean_path))
        append_hash_index(
            survivors.selectExpr("content_hash",
                                 f"{self.id_col} AS canonical_id"),
            self.index_table, buckets=self.buckets)
        # under foreachBatch, `survivors` is bound to the micro-batch's
        # cloned session while the NEXT batch's anti-join reads the
        # index through self.spark — whose cached file listing the
        # clone's append does not invalidate. Without this refresh,
        # batch N+1 silently dedups against the pre-batch-N index.
        self.spark.catalog.refreshTable(self.index_table)
        self.batches += 1
        self.survivor_count += survivors.count()
        return survivors
