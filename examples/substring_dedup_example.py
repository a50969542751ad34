"""End-to-end example: EXACT substring-level dedup (Lee et al. 2022).

Document-level dedup (hash / MinHash / SemDeDup) removes whole
near-duplicate documents; the step real pretraining pipelines run
AFTER it removes duplicated PASSAGES inside otherwise-unique
documents. This walkthrough is that flow on the round-8 surface:

  1. winnow fingerprints           (text.winnow_fingerprints — MOSS)
  2. anchored candidate pairs      (fingerprint overlap — complete
                                    for spans >= kw + w - 1 words)
  3. exact maximal shared spans    (text.common_span_pairs — the
                                    diagonal gaps-and-islands method,
                                    candidate-driven)
  4. keep-first strip              (text.strip_duplicate_spans)
  5. verify                        (re-run discovery on the cleaned
                                    corpus: the shared mass is gone)

Scale notes: step 2's fingerprint join is the bucketed candidate
generator (never corpus²); step 3 scoped to candidates costs
|pairs| x matches; step 4's covered positions are output-sized and
tokens never shuffle.

Run:  python examples/substring_dedup_example.py
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def synth_corpus(spark, n: int = 120):
    """Unique pseudo-word bodies; every third doc carries a 10-word
    quoted passage copied from doc (i - 3) — the duplicated-passage
    shape substring dedup exists for."""
    def words(i, count, stride):
        return [f"w{(i * 101 + j * stride) % 7919}" for j in range(count)]

    rows = []
    for i in range(n):
        body = words(i, 40, 13)
        if i % 3 == 0 and i >= 3:
            donor = words(i - 3, 40, 13)
            body = body[:15] + donor[5:15] + body[15:]
        rows.append((i, " ".join(body)))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def run(spark) -> dict:
    from recdb_postgresql_spark.operators import text

    kw, w = 3, 4          # winnow params: complete for spans >= 6
    min_span = 8
    docs = synth_corpus(spark).localCheckpoint()
    out: dict = {}

    # 1+2. winnow anchors -> candidate pairs
    fp = text.winnow_fingerprints(docs, k=kw, w=w)
    a = fp.select(F.col("doc_id").alias("id1"), "fp")
    b = fp.select(F.col("doc_id").alias("id2"), "fp")
    cand = (a.join(b, "fp").where("id1 < id2")
            .select("id1", "id2").distinct())
    out["candidate_pairs"] = cand.count()

    # 3. exact spans inside candidates only
    spans = text.common_span_pairs(docs, k=5, min_span=min_span,
                                   candidate_pairs=cand)
    out["shared_spans"] = spans.count()

    # 4. keep-first strip
    cleaned = text.strip_duplicate_spans(docs, k=5, min_span=min_span,
                                         candidate_pairs=cand)
    out["docs_stripped"] = cleaned.where(F.col("n_removed") > 0).count()
    out["words_removed"] = cleaned.agg(
        F.sum("n_removed")).collect()[0][0]

    # 5. verify: the cleaned corpus has no shared spans left at the
    #    same threshold (keep-first leaves exactly one copy of each)
    recheck = text.common_span_pairs(
        cleaned.select("doc_id", F.col("clean_text").alias("text")),
        k=5, min_span=min_span)
    out["spans_after"] = recheck.count()
    return out


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from recdb_postgresql_spark.engine import get_spark

    spark = get_spark("substring_dedup_example")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in run(spark).items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
