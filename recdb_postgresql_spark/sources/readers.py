"""Source layer: parquet table loading + events->ratings projection.

The reference bulk-loads `;`-separated files through COPY
(``PostgreSQL/scripts/install.pl:74-84``, ``recathon.c:1536-1538``);
the Spark-native sources are parquet/csv/json DataFrames. Test data
(TESTDATA.md) is one parquet per table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # TESTDATA parquet has stored events.ts as TIMESTAMP(NANOS) (read as
    # int64 via the legacy conf — Spark has no nanos type) and as
    # TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ). Normalize both
    # to int64 nanos-since-epoch: downstream code and the DuckDB oracles
    # (epoch_ns(ts)) derive hours/sessions arithmetically, which is
    # timezone-free and identical across both physical encodings. The
    # NTZ->TIMESTAMP cast interprets in the session timezone, so pin UTC
    # (the oracle's epoch_ns treats the naive value as UTC).
    #
    # Session-state invariant: engine.get_spark pins BOTH confs at
    # session construction, so for engine-built sessions these sets are
    # no-ops. They are repeated here only for FOREIGN sessions (the
    # driver's correctness harness builds its own SparkSession and
    # calls queries() directly) — which means load_table does mutate a
    # foreign session's timezone to UTC. That is deliberate: every
    # temporal operator and oracle in this repo assumes UTC, and a
    # caller needing another session timezone must set it after loads.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and "ts" in df.columns:
        dt = df.schema["ts"].dataType.typeName()
        if dt.startswith("timestamp"):
            df = df.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def load_csv(spark: SparkSession, path: str, schema: str,
             sep: str = ";") -> DataFrame:
    """The reference's bulk-load path is COPY of `;`-separated files
    (install.pl:74-84, movies.dat). Explicit schema — no inference scan."""
    return spark.read.schema(schema).option("sep", sep).csv(path)


def ratings_from_events(events: DataFrame, with_ts: bool = False) -> DataFrame:
    """Project the driver's events table onto the RecDB events-table
    shape ``(userkey int, itemkey int, eventval numeric)``
    (``parse_rec.c:187-297``): user_id is the user key and the ``k``
    field of the JSON props payload is the item key (100 distinct
    items), value is the event value. get_json_object is a codegen'd
    JVM expression — no Python in the scan path.

    ``with_ts`` adds ``ratingts`` (int64 nanos) — the analog of the
    reference's ``ratingts`` column (install.pl:74, stored but never
    read by recathon); feeds cf.normalize_events' half_life weighting.
    """
    cols = [
        F.col("user_id").alias("userid"),
        F.get_json_object("props", "$.k").cast("int").alias("itemid"),
        F.col("value").cast("double").alias("ratingval"),
    ]
    if with_ts:
        cols.append(F.col("ts").cast("long").alias("ratingts"))
    return events.select(*cols).where(F.col("itemid").isNotNull())


# DuckDB-side equivalent projection for oracle queries
RATINGS_SQL = """
SELECT user_id AS userid,
       CAST(json_extract_string(props, 'k') AS INT) AS itemid,
       CAST(value AS DOUBLE) AS ratingval
FROM events
WHERE json_extract_string(props, 'k') IS NOT NULL
"""
