"""Sinks tuned for re-reading at scale.

Parquet append is the baseline sink (the reference's heap-table
INSERT). The two here encode layout decisions that only matter when
the SAME table is joined or scanned repeatedly at 100 TB:

- ``write_bucketed``: hash-bucket by the join key at write time so
  later equi-joins/aggregations on that key need no shuffle at all
  (Spark reads bucket files as pre-partitioned). This is what the
  events table should look like on disk for a recommender workload —
  bucketed by user for item-CF training and per-user serving.
- ``write_sorted``: partition-pruned + min/max-friendly layout:
  coarse partition dirs on a low-cardinality column plus in-file sort
  so parquet row-group statistics prune point/range scans (the
  B-tree-index analog; SURVEY §2.2 IndexScan row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   sort: bool = True) -> None:
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_sorted(df: DataFrame, path: str, partition_col: str,
                 sort_col: str) -> None:
    (df.repartition(partition_col)
       .sortWithinPartitions(sort_col)
       .write.mode("overwrite")
       .partitionBy(partition_col)
       .parquet(path))


def write_jsonl(df: DataFrame, path: str, compression: str | None = None,
                max_records_per_file: int = 0) -> None:
    """Line-delimited JSON sink — the lingua franca of training-data
    interchange (one document per line, tool-agnostic). Uncompressed
    JSONL is line-splittable, so a 100 TB export stays readable in
    parallel; with ``compression`` (gzip/zstd) each FILE becomes the
    split unit instead, so pair it with ``max_records_per_file`` to
    bound file size (and therefore downstream task granularity)."""
    w = df.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSONL source with a REQUIRED schema: at 100 TB, schema
    inference is a full extra pass over the data before the real scan
    — never acceptable — and silently widens types on dirty rows.
    ``columnNameOfCorruptRecord`` rows surface as nulls under the
    default PERMISSIVE mode; pass a DDL string like
    ``"doc_id BIGINT, text STRING"``."""
    return spark.read.schema(schema).json(path)
