"""End-to-end example: the ANN serving stack.

The eighth walkthrough — the RETRIEVAL surface: how a query travels
through a production vector-search stack built from this engine's
operators, every stage a lazy DataFrame:

  1. normalize     L2-normalize once (cosine becomes dot product)
  2. index build   coarse IVF cells + PQ codebooks/codes — the
                   compressed corpus (32x) that serves queries;
                   raw vectors stay cold
  3. shortlist     IVF-PQ: probe nprobe coarse cells, ADC-score only
                   those cells' codes (m table lookups per vector)
  4. refine        exact re-rank of the ADC shortlist against the raw
                   vectors — the standard two-stage recipe: ADC
                   recalls candidates cheaply, exact cosine fixes
                   their order (quantization error never decides the
                   final ranking)
  5. fuse          reciprocal-rank fusion with BM25 keyword retrieval
                   (rank-level, no score calibration)
  6. diversify     greedy MMR re-rank so the page isn't ten
                   near-identical hits

Run:  python examples/ann_serving_example.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from recdb_postgresql_spark.operators import similarity, text  # noqa: E402
from recdb_postgresql_spark.sources.readers import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def run(spark, sf_dir: str = SF_DIR, verbose: bool = True):
    say = print if verbose else (lambda *a, **k: None)
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")

    # 1-2: normalize + build the compressed index
    unit = similarity.unit_normalize(emb).withColumnRenamed("unit", "uv")
    cent = similarity.first_k_centroids(unit, k=8, vec_col="uv")
    books = similarity.pq_train(unit, m=8, k=32, vec_col="uv",
                                sample=2048, iters=4)
    codes = similarity.pq_encode(unit, books, vec_col="uv")
    assign = similarity.ivf_assign(unit, cent, vec_col="uv")
    say(f"indexed {codes.count()} vectors as 8-byte PQ codes")

    # 3: IVF-PQ shortlist for the doc-0 query
    q = unit.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("uv").alias("qvec"))
    probed = similarity.ivf_assign(
        q.select(F.col("qid").alias("vec_id"), F.col("qvec").alias("uv")),
        cent, vec_col="uv", n=3).select("cell").distinct()
    cand_codes = codes.join(assign, "vec_id") \
        .join(F.broadcast(probed), "cell").select("vec_id", "codes")
    shortlist = similarity.pq_topk(cand_codes, books, q, k=50) \
        .select("vec_id")
    say(f"ADC shortlist: {shortlist.count()} candidates "
        f"(corpus {unit.count()})")

    # 4: exact refine — re-rank ONLY the shortlist on raw vectors
    refined = similarity.brute_force_topk(
        unit.join(shortlist, "vec_id"), q, k=20, vec_col="uv")
    sem = refined.select(F.col("vec_id").alias("doc_id"), "rank")

    # 5: fuse with keyword retrieval
    lex = text.bm25_topk(docs, ["spark", "window", "merge"], k=20)
    w = Window.orderBy(F.desc("score"), F.col("doc_id"))
    lex = lex.select("doc_id", F.row_number().over(w).alias("rank"))
    fused = similarity.rrf_fuse([lex, sem], k0=60, k=15)
    say(f"fused top-15 (semantic + keyword): "
        f"{[r.doc_id for r in fused.orderBy('rank').collect()]}")

    # 6: diversify the page
    cand = fused.select(F.col("doc_id").alias("item"),
                        F.col("rrf").alias("score"),
                        F.lit(0).alias("user"))
    page = similarity.mmr_rerank(cand, emb, k=10, lam=0.7,
                                 user_col="user", item_col="item",
                                 score_col="score")
    rows = sorted(page.collect(), key=lambda r: r.mmr_rank)
    say("served page (MMR-diversified):")
    for r in rows:
        say(f"  #{r.mmr_rank}: doc {r.item}")
    return shortlist, refined, fused, rows


if __name__ == "__main__":
    from recdb_postgresql_spark.engine import get_spark

    s = get_spark("ann_serving_example")
    s.sparkContext.setLogLevel("ERROR")
    run(s)
