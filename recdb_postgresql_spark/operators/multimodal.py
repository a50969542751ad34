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
    the payload, repeated/scaled into [-1, 1). Replace with e.g.
    PIL.Image.open + a vision tower in production.

    Feature = (byte - 128) / 128: every value is an exact multiple of
    2^-7, exactly representable in float32 AND double, so the encoder
    is SQL-re-expressible from the md5 hex string (per-byte
    ``substring`` + hex parse) and the whole flow is oracle-checkable
    with bit-exact arithmetic — no float-rounding tolerance needed.
    """
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    digest = hashlib.md5(payload).digest()
    raw = np.frombuffer((digest * ((dim // len(digest)) + 1))[:dim], dtype=np.uint8)
    return (raw.astype(np.float32) - np.float32(128.0)) / np.float32(128.0)


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


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """(media_id, out_width, out_height, scale) — aspect-preserving
    resize targets from metadata ONLY (payload never read): the
    planning half of a resize stage, SQL-expressible and
    oracle-checkable. Media already within ``max_side`` keep their
    dimensions (scale 1.0)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    long_side = F.greatest(w, h)
    scale = F.when(long_side > max_side,
                   F.lit(max_side) / long_side).otherwise(F.lit(1.0))
    return (media.where(F.col("kind") == "image")
            .where(w.isNotNull() & h.isNotNull())
            .select("media_id",
                    F.floor(w * scale).cast("int").alias("out_width"),
                    F.floor(h * scale).cast("int").alias("out_height"),
                    F.round(scale, 6).alias("scale")))


def resize_image(media: DataFrame, max_side: int = 256) -> DataFrame:
    """(media_id, out_width, out_height, payload) — the execution half
    of the resize stage: Arrow-batched ``mapInPandas`` with the
    deterministic fake 'resizer' (payload md5-rehashed with the target
    dims; swap ``_fake_resize`` for PIL.Image.resize in production —
    the batch shape, schema and partitioning are exactly what a real
    decode stage uses)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ])
    # same null-dimension filter as resize_plan: without it, NaN from
    # to_numpy(float) would floor to INT_MIN garbage for rows with
    # missing metadata — both halves of the stage must agree on which
    # rows are resizable
    planned = (media.where(F.col("kind") == "image")
               .where(F.col("meta.width").isNotNull()
                      & F.col("meta.height").isNotNull())
               .select("media_id", "payload",
                       F.col("meta.width").alias("w"),
                       F.col("meta.height").alias("h")))

    def _fake_resize(payload, ow, oh):
        if payload is None:
            return None
        return hashlib.md5(bytes(payload) + f":{ow}x{oh}".encode()).digest()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["w"].to_numpy(dtype=float)
            h = pdf["h"].to_numpy(dtype=float)
            long_side = np.maximum(w, h)
            scale = np.where(long_side > max_side, max_side / long_side, 1.0)
            ow = np.floor(w * scale).astype("int32")
            oh = np.floor(h * scale).astype("int32")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "out_width": ow,
                "out_height": oh,
                "payload": [_fake_resize(p, a, b) for p, a, b
                            in zip(pdf["payload"], ow, oh)],
            })

    return planned.mapInPandas(run, schema=out_schema)


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


def attach_external_features(media: DataFrame, features: DataFrame,
                             id_col: str = "media_id",
                             features_col: str = "features",
                             dim: int = FEATURE_DIM,
                             on_missing: str = "error") -> DataFrame:
    """The PRODUCTION on-ramp for real encoders (r8 verdict stretch):
    accept feature vectors computed OUTSIDE this engine — a GPU
    inference fleet, a vendor embedding API, a prior batch job — and
    attach them to the media frame in exactly the layout
    ``extract_features`` produces, so every downstream consumer (ANN
    indexes, cross-modal retrieval, near-dup, kNN-classify) is
    agnostic to whether features came from the in-engine encoder or
    an external one. ``features`` needs (id_col, features_col:
    array<float/double>); payload bytes are NEVER read on this path —
    column pruning keeps the media scan metadata-only.

    Validation: rows whose vector is missing or not ``dim`` long
    raise by default (``on_missing='error'``, driver-side count — the
    misuse surface of feeding a 512-dim table to a 16-dim index), or
    are dropped with ``on_missing='drop'`` for
    best-effort-by-contract pipelines. Scale shape: one equi-join on
    the id (broadcast when the media batch is small), one map-side
    size check — no shuffle beyond the join."""
    f = features.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(features_col).cast("array<float>").alias("features"))
    joined = (media.select(id_col, "kind")
              .join(f, id_col, "left"))
    bad = joined.where(F.col("features").isNull()
                       | (F.size("features") != int(dim)))
    if on_missing == "error":
        n_bad = bad.limit(1).count()
        if n_bad:
            sample = bad.select(id_col).limit(5).collect()
            raise ValueError(
                f"external features missing or not {dim}-dim for ids "
                f"{[r[id_col] for r in sample]} (pass "
                "on_missing='drop' to skip them)")
    elif on_missing != "drop":
        raise ValueError("on_missing must be 'error' or 'drop'")
    return joined.where(F.col("features").isNotNull()
                        & (F.size("features") == int(dim)))
