"""End-to-end example: corpus curation with the round-7 surface.

Where ``pipeline_example.py`` walks the classic cleaning ladder
(lang-id -> quality -> dedup -> chunk), this walkthrough covers the
curation half a large-scale pipeline runs around it:

  1. profile the drop            (profile.profile_table — ANALYZE)
  2. strip template boilerplate  (text.strip_common_spans)
  3. EXACT near-dup pair join    (dedup.prefix_filtered_pairs — the
                                  scalable exact path; LSH is the
                                  approximate one)
  4. rank duplication hubs       (graph.pagerank over the pair graph)
  5. importance-weight to target (text.importance_weights, DSIR)
  6. rebalance the language mix  (sampling.stratified_sample)
  7. deterministic split         (sampling.hash_split)
  8. Z-order the output          (sinks.write_zordered — multi-dim
                                  data skipping for later scans)

Every stage is a lazy DataFrame until its count prints; the writes at
the end are the only materialization.

Run:  python examples/curation_example.py [output_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F


def synth_corpus(spark, n: int = 150):
    """Deterministic corpus with a shared template header (so span
    stripping and the pair graph have something to find), per-doc
    pseudo-word bodies, and a skewed language mix."""
    template = "all rights reserved subscribe to the newsletter for more"

    def body(i: int) -> str:
        words = [f"w{(i * 37 + j * 11) % 4999}" for j in range(30)]
        return template + " " + " ".join(words)

    rows = []
    for i in range(n):
        lang = ["en", "en", "en", "de", "zh"][i % 5]   # 60/20/20 skew
        if i % 12 == 5:                                # planted near-dup
            rows.append((i, body(i - 1) + " tail", lang))
        else:
            rows.append((i, body(i), lang))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def run(spark, out_dir: str | None = None) -> dict:
    from recdb_postgresql_spark.functions import sampling
    from recdb_postgresql_spark.operators import dedup, graph, profile, text
    from recdb_postgresql_spark.sources import sinks

    docs = synth_corpus(spark)
    out: dict = {}

    # 1. profile the incoming drop (one aggregation job)
    prof = profile.profile_table(docs.withColumn(
        "n_chars", F.length("text")), ["doc_id", "n_chars"])
    out["profile_rows"] = prof.count()

    # 2. cut template spans shared by >25% of docs
    cleaned = text.strip_common_spans(docs, n=3, max_doc_freq=40)
    out["docs_with_removal"] = cleaned.where(F.col("n_removed") > 0).count()

    # 3. exact near-dup pairs at threshold 0.5 — prefix filtering
    #    returns the identical pair set as the quadratic baseline
    pairs = dedup.prefix_filtered_pairs(
        dedup.word_shingles(cleaned, text_col="clean_text"), threshold=0.5)
    out["near_dup_pairs"] = pairs.count()

    # 4. hub ranking: which docs near-duplicate the most others
    ranks = graph.pagerank(pairs)
    out["ranked_nodes"] = ranks.count()

    # 5. DSIR weights toward the English slice
    w = text.importance_weights(docs, docs.where(F.col("lang") == "en"),
                                n=2, num_buckets=64)
    out["weighted_docs"] = w.count()

    # 6+7. rebalance the mix, then split deterministically
    mixed = sampling.stratified_sample(
        docs, "lang", F.col("doc_id"), {"en": 0.5}, default=1.0)
    split = sampling.hash_split(mixed, F.col("doc_id"))
    out["mix_by_split"] = {
        (r.split, r.lang): r.n
        for r in split.groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n")).collect()}

    # 8. Z-order the curated output by (doc_id, n_words) so later
    #    scans skip files on either column
    out_dir = out_dir or tempfile.mkdtemp()
    final = split.withColumn(
        "n_words", F.size(F.split(F.col("text"), r"\s+")))
    sinks.write_zordered(final, out_dir + "/curated",
                         ["doc_id", "n_words"], bits=10, num_files=4)
    out["written"] = spark.read.parquet(out_dir + "/curated").count()
    return out


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from recdb_postgresql_spark.engine import get_spark

    spark = get_spark("curation_example")
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark, sys.argv[1] if len(sys.argv) > 1 else None)
    for k, v in out.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
