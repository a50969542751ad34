"""End-to-end example: the multimodal pipeline with EXTERNAL features.

The decode step in this container is an honest stub
(``multimodal.decode_image`` raises — no image libs), so the in-engine
encoder is a deterministic fake. This walkthrough documents the
PRODUCTION on-ramp around that stub: everything except the encoder
forward-pass is real Spark plumbing, and a real encoder plugs in at
exactly one seam.

  1. land media rows              (binary payload + typed metadata)
  2. plan work from metadata ONLY (frame_sample / resize_plan — the
                                   payload column is pruned away)
  3. encode OUT-OF-ENGINE         (here: simulated with the
                                   deterministic fake over collected
                                   payloads — in production this is
                                   your GPU fleet writing
                                   (media_id, features) parquet)
  4. attach external features     (multimodal.attach_external_features
                                   — validates ids + dimensionality,
                                   never touches payload bytes)
  5. serve                        (cosine ANN top-k over the attached
                                   vectors — same downstream as the
                                   in-engine encoder path)

Run:  python examples/multimodal_example.py
"""

from __future__ import annotations

from pyspark.sql import functions as F


def run(spark, verbose: bool = True):
    import tempfile

    from recdb_postgresql_spark.operators import multimodal, similarity

    out = {}
    land = tempfile.mkdtemp(prefix="mm_media_") + "/media"
    multimodal.synthetic_media(spark, n=60).write.parquet(land)
    media = spark.read.parquet(land)
    out["media_rows"] = media.count()

    # -- 2. metadata-only planning (payload never read): against the
    # parquet landing zone, column pruning keeps payload bytes out of
    # the scan entirely — check the executed plan's ReadSchema.
    frames = multimodal.frame_sample(media, every_ms=1000)
    resize = multimodal.resize_plan(media, max_side=256)
    out["planned_frames"] = frames.count()
    out["planned_resizes"] = resize.count()
    plan = frames._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema")[1][:200] \
        if "ReadSchema" in plan else ""
    out["frame_plan_reads_payload"] = "payload" in read_schema

    # -- 3. the external encoder (the seam) ---------------------------
    # Production: a GPU inference job reads payloads, writes
    # (media_id, features) parquet. Simulated here with the same
    # deterministic fake the in-engine path uses, computed OUTSIDE
    # Spark over a driver-side collect — the point is the interface,
    # not the encoder.
    ext_rows = [
        (r["media_id"],
         multimodal._fake_decode_features(bytes(r["payload"])).tolist())
        for r in media.select("media_id", "payload").collect()
    ]
    external = spark.createDataFrame(
        ext_rows, "media_id long, features array<float>")

    # -- 4. attach: validated join, payload-free ----------------------
    feats = multimodal.attach_external_features(media, external)
    out["featured_rows"] = feats.count()

    # parity: the external path lands byte-identical to the in-engine
    # encoder (same fake), proving downstream-agnosticism
    internal = multimodal.extract_features(media) \
        .select("media_id", F.col("features").alias("f2"))
    out["parity_mismatch"] = (
        feats.join(internal, "media_id")
        .where(F.col("features") != F.col("f2")).count())

    # -- 5. serve: cosine top-k over the attached vectors -------------
    emb = feats.select(F.col("media_id").alias("vec_id"),
                       F.col("features").cast("array<double>")
                       .alias("embedding"))
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    topk = similarity.brute_force_topk(emb, qs, k=4)
    out["served_queries"] = topk.select("qid").distinct().count()

    # misuse surface: wrong-dim vectors raise by name
    try:
        multimodal.attach_external_features(
            media, external.withColumn(
                "features", F.slice("features", 1, 8)))
        out["dim_check_raises"] = False
    except ValueError:
        out["dim_check_raises"] = True

    if verbose:
        for k, v in out.items():
            print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from recdb_postgresql_spark.engine import get_spark

    s = get_spark("multimodal_example")
    s.sparkContext.setLogLevel("ERROR")
    run(s)
