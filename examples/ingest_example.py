"""End-to-end example: incremental corpus ingestion with persisted
dedup state.

The sixth walkthrough: the ingest surface — how a training-data
pipeline receives batch after batch (or a micro-batched stream) and
keeps ONE authoritative clean corpus without ever re-reading
yesterday's data:

  1. seed            day-0 corpus hashed into the bucketed hash index
                     (dedup.write_hash_index) and MinHash-banded into
                     the LSH index (dedup.write_lsh_index) — dedup
                     state lives ON DISK, never in stream memory
  2. exact gate      StreamingIndexDeduper: content seen in ANY
                     earlier batch is dropped, forever (no watermark
                     horizon)
  3. near-dup gate   StreamingNearDupDeduper: batch docs whose
                     verified Jaccard against the indexed corpus
                     clears the threshold are dropped; survivors
                     advance the index so the NEXT batch sees them
  4. audit           dedup.corpus_diff between the seed corpus and
                     the final clean corpus — what did ingestion
                     actually add?

Every join against the indexes is bucket-aligned (zero Exchange on
the index side — the 100 TB contract: the corpus-sized state never
shuffles, only each incoming batch moves).

Run:  python examples/ingest_example.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from recdb_postgresql_spark.operators import dedup  # noqa: E402
from recdb_postgresql_spark.streaming import (StreamingIndexDeduper,  # noqa: E402
                                              StreamingNearDupDeduper)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def run(spark, sf_dir: str = SF_DIR, work_dir: str | None = None,
        verbose: bool = True):
    from recdb_postgresql_spark.sources.readers import load_table

    work_dir = work_dir or tempfile.mkdtemp(prefix="ingest_example_")
    # a managed table's directory outlives the per-process metastore —
    # clear BOTH halves or a rerun hits LOCATION_ALREADY_EXISTS
    import shutil
    wh = spark.conf.get("spark.sql.warehouse.dir")
    for pre in ("file://", "file:"):
        if wh.startswith(pre):
            wh = wh[len(pre):]
            break
    for t in ("ing_ex_hash", "ing_ex_lsh_bands", "ing_ex_lsh_sh"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    day0 = docs.where(F.col("doc_id") % 2 == 0).localCheckpoint()

    # 1. seed both persisted indexes from the day-0 corpus
    dedup.write_hash_index(day0, "ing_ex_hash", buckets=8)
    dedup.write_lsh_index(day0, "ing_ex_lsh", buckets=8)

    exact_gate = StreamingIndexDeduper(spark, "ing_ex_hash", buckets=8)
    near_gate = StreamingNearDupDeduper(
        spark, "ing_ex_lsh", clean_path=os.path.join(work_dir, "clean"),
        buckets=8)

    # 2-3. two ingest batches: batch 1 re-sends some day-0 content
    # verbatim (exact gate) plus the odd-id docs (organic near-dups of
    # day-0 get caught by the near gate; the rest survive)
    b1 = (day0.limit(20)
          .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
          .unionByName(docs.where(F.col("doc_id") % 2 == 1)))
    s1 = near_gate.on_batch(exact_gate.on_batch(b1))

    # batch 2 re-sends batch 1's survivors (now indexed -> all dropped)
    # plus genuinely new synthetic docs
    fresh = spark.range(5).select(
        (F.col("id") + 2_000_000).alias("doc_id"),
        F.concat(F.lit("synthetic ingest document number "),
                 F.col("id").cast("string"),
                 F.lit(" with deliberately unique never-seen wording "
                       "for the walkthrough")).alias("text"))
    b2 = s1.select((F.col("doc_id") + 3_000_000).alias("doc_id"), "text") \
           .unionByName(fresh)
    near_gate.on_batch(exact_gate.on_batch(b2))

    # 4. audit: the final clean corpus vs day 0
    # the exact gate's survivors carry content_hash through the chain;
    # the audit only needs (doc_id, text)
    clean = spark.read.parquet(os.path.join(work_dir, "clean")) \
        .select("doc_id", "text")
    diff = dedup.corpus_diff(day0, day0.unionByName(clean))
    mix = {r.status: r.n for r in
           diff.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}

    out = {
        "day0_docs": day0.count(),
        "batch1_in": b1.count(), "batch1_survivors": s1.count(),
        "batches": near_gate.batches,
        "survivors_total": near_gate.survivor_count,
        "near_dropped": near_gate.dropped_count,
        "clean_docs": clean.count(),
        "diff_mix": mix,
    }
    if verbose:
        for k, v in out.items():
            print(f"{k}: {v}")
    for t in ("ing_ex_hash", "ing_ex_lsh_bands", "ing_ex_lsh_sh"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


if __name__ == "__main__":
    from recdb_postgresql_spark.engine import get_spark

    spark = get_spark("ingest_example")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark)
