"""Scale stress: synthetically amplify the sf0.1 events table in-plan
(union with shifted user ids — no files written, testdata untouched)
and time the item-cos + user-cos training pipelines at ~sf1 and ~sf3
equivalents. This is the 'would the plan survive a 10-30x scale-up'
probe: the pair join stays sparse, partial aggregation stays map-side,
and shuffle partition counts follow data volume.

Run: python stress.py [multiplier ...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from recdb_postgresql_spark.engine import get_spark
from recdb_postgresql_spark.operators import cf
from recdb_postgresql_spark.sources.readers import load_table, ratings_from_events


def amplified_ratings(spark, sf_dir: str, mult: int):
    ev = ratings_from_events(load_table(spark, sf_dir, "events"))
    parts = [ev.select((F.col("userid") + F.lit(i * 1_000_000)).alias("userid"),
                       "itemid", "ratingval") for i in range(mult)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return cf.normalize_events(out, "userid", "itemid", "ratingval")


def amplified_docs(spark, sf_dir: str, mult: int):
    """mult copies of the documents table with distinct ids and a
    per-copy suffix token so copies are near- but not exact-duplicates
    of each other (keeps the shingle space growing like real data)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    parts = [docs.select(
        (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
        F.concat_ws(" ", "text", F.lit(f"copytag{i}")).alias("text"))
        for i in range(mult)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dedup_probe(spark, sf_dir: str, mult: int) -> None:
    """Exact inverted-index Jaccard vs the LSH-verified flow at
    amplified doc counts: exact grows with co-shingling pairs
    (superlinear), verified with candidates x shingles/doc (linear-ish)
    — the asymptotic proof behind VERDICT r1 fix #1 that sf0.1 alone
    is too small to show."""
    from recdb_postgresql_spark.operators import dedup

    docs = amplified_docs(spark, sf_dir, mult)
    sh = dedup.word_shingles(docs)
    t0 = time.perf_counter()
    n_exact = dedup.jaccard_pairs(sh, threshold=0.5).count()
    t_exact = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_ver = dedup.lsh_verified_pairs(sh, threshold=0.5, num_hashes=8,
                                     bands=4, rows_per_band=2).count()
    t_ver = time.perf_counter() - t0
    print(f"mult={mult} exact_pairs={n_exact} exact_s={t_exact:.1f} "
          f"lsh_verified_pairs={n_ver} verified_s={t_ver:.1f} "
          f"speedup={t_exact / max(t_ver, 1e-9):.1f}x", flush=True)


def amplified_embeddings(spark, sf_dir: str, mult: int):
    emb = load_table(spark, sf_dir, "embeddings")
    parts = [emb.select((F.col("vec_id") + F.lit(i * 10_000_000))
                        .alias("vec_id"), "embedding")
             for i in range(mult)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ann_probe(spark, sf_dir: str, mult: int) -> None:
    """Brute-force vs IVF vs multi-probe LSH top-k at amplified vector
    counts: brute force grows O(n) per query (all-pairs scored), the
    bucketed paths grow with candidates-per-bucket only — the
    'would the ANN survive 100x vectors' probe."""
    from recdb_postgresql_spark.operators import similarity

    emb = amplified_embeddings(spark, sf_dir, mult).localCheckpoint()
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    timings = {}
    t0 = time.perf_counter()
    timings["brute"] = (similarity.brute_force_topk(emb, qs, k=10).count(),
                        time.perf_counter() - t0)
    cents = similarity.first_k_centroids(emb, k=16)
    t0 = time.perf_counter()
    timings["ivf_np2"] = (similarity.ivf_topk(emb, qs, cents, k=10,
                                              nprobe=2).count(),
                          time.perf_counter() - t0)
    t0 = time.perf_counter()
    timings["lsh_mp"] = (similarity.lsh_topk(emb, qs, k=10).count(),
                         time.perf_counter() - t0)
    msg = " ".join(f"{k}_rows={n} {k}_s={t:.1f}" for k, (n, t) in timings.items())
    print(f"mult={mult} {msg}", flush=True)


def cc_probe(spark, n_chain: int) -> None:
    """Star connected components on a PATH graph of n nodes — the
    worst case (diameter = n) where label propagation needs n shuffle
    rounds and a boilerplate-chained 100 TB corpus would stall; the
    alternating large-star/small-star path must finish in O(log n)
    rounds regardless."""
    from recdb_postgresql_spark.operators import dedup

    pairs = (spark.range(n_chain - 1)
             .select(F.col("id").alias("id1"),
                     (F.col("id") + 1).alias("id2")))
    t0 = time.perf_counter()
    n_comp = (dedup.connected_components_star(pairs)
              .select("component").distinct().count())
    t = time.perf_counter() - t0
    assert n_comp == 1, f"path graph must collapse to 1 component, got {n_comp}"
    print(f"chain={n_chain} components={n_comp} star_cc_s={t:.1f}", flush=True)


def main():
    mults = [int(x) for x in sys.argv[1:]] or [10, 30]
    spark = get_spark("recdb_stress")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    cc_probe(spark, 100_000)
    for mult in mults:
        dedup_probe(spark, sf_dir, mult)
    for mult in mults:
        ann_probe(spark, sf_dir, mult)
    for mult in mults:
        r = amplified_ratings(spark, sf_dir, mult)
        n = r.count()
        t0 = time.perf_counter()
        n_model = cf.train_item_cos(r).count()
        t_item = time.perf_counter() - t0
        # exact user-CF is quadratic in raters-per-item (infeasible past
        # ~2000 raters/item); the capped variant is the scale lever.
        t0 = time.perf_counter()
        n_user = cf.train_user_cos(r, max_coraters=500).count()
        t_user = time.perf_counter() - t0
        print(f"mult={mult} ratings={n} item_model_pairs={n_model} "
              f"item_train_s={t_item:.1f} capped_user_pairs={n_user} "
              f"user_train_capped_s={t_user:.1f}", flush=True)


if __name__ == "__main__":
    main()
