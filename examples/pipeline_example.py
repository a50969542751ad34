"""End-to-end example: a training-data corpus pipeline, Spark-first.

The companion to the MovieLens recommender walkthrough: the other half
of this engine is the large-scale training-data surface (BASELINE.json
north star). This script synthesizes a small messy corpus — exact
duplicates, near-duplicates, boilerplate/looping text, multiple
languages — and runs the full cleaning ladder the driver queries
exercise individually:

  1. language ID            (text.lang_id, keep 'en')
  2. quality floor          (text.quality_score)
  3. repetition filter      (text.repetition_stats, Gopher-style)
  4. decontamination        (text.contamination_flags vs a held-out
                             eval slice; n=8 — the corpus's common
                             closing phrase is only 5 words, so the
                             8-gram window skips shared boilerplate
                             and flags real copies only)
  5. exact dedup            (dedup.exact_duplicates, keep canonical)
  6. near-dedup             (dedup.lsh_verified_pairs, keep lower id)
  7. context-window chunks  (text.chunk_documents)
  8. deterministic sample   (functions.sampling.hash_sample)

Every stage stays one lazy Catalyst plan until the stage counts are
printed; nothing leaves the JVM (the dedup/verify flow is the
candidate-driven production shape, not the quadratic baseline).

Run:  python examples/pipeline_example.py
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def synth_corpus(spark, n: int = 120):
    """Messy deterministic corpus: distinct english prose docs, plus
    exact dups, near dups (two words changed), loop spam and german
    rows. Doc bodies are deterministic pseudo-word streams so distinct
    docs share almost no shingles — only the planted pairs dedup."""
    def body(i: int) -> str:
        words = [f"w{(i * 31 + j * 7) % 9973}" for j in range(40)]
        return "the " + " ".join(words) + " and the end of it"

    rows = []
    for i in range(n):
        if i % 10 == 7:
            rows.append((i, "spam " * 20))                     # repetition
        elif i % 10 == 8:
            rows.append((i, "der hund und die katze und der vogel "
                            "sind gute freunde geworden"))
        elif i % 10 == 9:
            rows.append((i, rows[i - 9][1]))                   # exact dup
        elif i % 10 == 5:
            near = body(i - 1).replace("w", "x", 2)            # near dup
            rows.append((i, near))
        else:
            rows.append((i, body(i)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def run(spark, verbose: bool = True):
    from recdb_postgresql_spark.functions.sampling import hash_sample
    from recdb_postgresql_spark.operators import dedup, text

    docs = synth_corpus(spark)
    counts = {"raw": docs.count()}

    en = text.lang_id(docs).where(F.col("pred_lang") == "en") \
        .select("doc_id")
    good = text.quality_score(docs).where(F.col("quality") >= 0.3) \
        .select("doc_id")
    tight = text.repetition_stats(docs).where(
        (F.col("dup_ngram_ratio") < 0.5) & (F.col("top_ngram_ratio") < 0.5)) \
        .select("doc_id")
    kept = docs.join(en, "doc_id").join(good, "doc_id").join(tight, "doc_id")
    counts["after_lang_quality_repetition"] = kept.count()

    # decontamination: docs with id % 40 == 2 stand in for the eval
    # set; drop them from the corpus and anything sharing an 8-gram
    bench = docs.where(F.col("doc_id") % 40 == 2)
    kept = kept.where(F.col("doc_id") % 40 != 2)
    contam = text.contamination_flags(kept, bench, n=8)
    kept = kept.join(contam.select("doc_id"), "doc_id", "left_anti")
    counts["after_decontamination"] = kept.count()

    ex = dedup.exact_duplicates(kept)
    kept = kept.join(ex.where(F.col("doc_id") != F.col("canonical_id"))
                     .select("doc_id"), "doc_id", "left_anti")
    counts["after_exact_dedup"] = kept.count()

    near = dedup.lsh_verified_pairs(dedup.word_shingles(kept),
                                    threshold=0.5, num_hashes=8,
                                    bands=4, rows_per_band=2)
    kept = kept.join(near.select(F.col("id2").alias("doc_id")).distinct(),
                     "doc_id", "left_anti")
    counts["after_near_dedup"] = kept.count()

    chunks = text.chunk_documents(kept, chunk_tokens=16)
    counts["chunks"] = chunks.count()

    sample = hash_sample(chunks, F.concat_ws(":", "doc_id", "chunk_idx"), 0.5)
    counts["sampled_chunks"] = sample.count()

    if verbose:
        for k, v in counts.items():
            print(f"{k:36s} {v}")
    return counts


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from recdb_postgresql_spark.engine import get_spark

    spark = get_spark("pipeline_example", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    run(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
