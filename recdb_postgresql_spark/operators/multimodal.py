"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature libraries (PIL, torchaudio, ffmpeg, ...) are NOT in
this container, so the byte-level decoders are stubbed — but the
Spark-side contract is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` signatures, and partition behavior are exactly what a
production decode stage uses; only the inner ``_decode_*`` call would
change.

Design for 100 TB:
- payloads travel as parquet ``binary`` columns next to their typed
  metadata struct, so pruning a metadata-only query never reads bytes;
- decode runs in ``mapInPandas`` (Arrow batches, one Python worker per
  core) with ``spark.sql.execution.arrow.maxRecordsPerBatch`` tuned so
  a batch of decoded frames fits executor memory;
- feature outputs are fixed-width ``array<float>`` ready for the
  similarity operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_DIM = 16


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: md5 bytes of
    the payload, repeated/scaled into [-1, 1]. Replace with e.g.
    PIL.Image.open + a vision tower in production.
    """
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    digest = hashlib.md5(payload).digest()
    raw = np.frombuffer((digest * ((dim // len(digest)) + 1))[:dim], dtype=np.uint8)
    return (raw.astype(np.float32) - 127.5) / 127.5


def decode_image(payload: bytes):  # pragma: no cover - real decoder absent
    """Stub for the actual byte decoder (no image libs in container)."""
    raise NotImplementedError("image decode requires PIL/cv2; not in this env")


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(media_id, kind, features array<float>) via mapInPandas — the
    production plumbing with the deterministic fake encoder."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p, dim).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
            })

    return media.mapInPandas(run, schema=out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_idx, ts_ms) — video frame sampling plan from
    metadata only (no byte decode): one row per sampled frame. The
    payload column is never read — column pruning keeps the scan
    metadata-only."""
    n = (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (media.where(F.col("kind") == "video")
            .select("media_id",
                    F.posexplode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))))
            .select("media_id", F.col("pos").alias("frame_idx"),
                    (F.col("col") * every_ms).alias("ts_ms")))


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = md5-derived
    bytes keyed by id)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media:{i}".encode()).digest() * 4
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
            "width": 64 if kind != "audio" else None,
            "height": 48 if kind != "audio" else None,
            "duration_ms": 5000 + 137 * i if kind != "image" else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
