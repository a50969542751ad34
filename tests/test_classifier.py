"""Hashed-BoW logistic-regression corpus filter — the no-oracle pins
for docs_quality_classifier."""

from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import classifier
from recdb_postgresql_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _labeled_docs(spark):
    from recdb_postgresql_spark.operators import text

    raw = load_table(spark, SF, "documents")
    return raw.join(
        text.quality_score(raw).select(
            "doc_id", (F.col("quality") >= 0.75).cast("double")
            .alias("label")), "doc_id")


def test_classifier_distills_heuristic_on_holdout(spark):
    """Distillation contract: the hashed-BoW linear model must
    recover the heuristic quality label on held-out docs — the signal
    (length, stopword counts) is linear in raw token counts."""
    docs = _labeled_docs(spark)
    train = docs.where(F.col("doc_id") % 5 != 0)
    held = docs.where(F.col("doc_id") % 5 == 0)
    model = classifier.train_quality_classifier(train, "label")
    scored = classifier.score_quality(model, held) \
        .join(held.select("doc_id", "label"), "doc_id")
    rows = scored.collect()
    assert rows and all(0.0 <= r.quality_prob <= 1.0 for r in rows)
    acc = sum(1 for r in rows
              if (r.quality_prob >= 0.5) == (r.label == 1.0)) / len(rows)
    assert acc >= 0.8, acc


def test_classifier_score_is_map_side(spark):
    """Scoring must not shuffle: the plan is scan -> project (model
    broadcast in the transform), no Exchange."""
    model = classifier.train_quality_classifier(
        _labeled_docs(spark).where(F.col("doc_id") % 5 != 0), "label")
    raw = load_table(spark, SF, "documents")  # scoring needs no label
    plan = (classifier.score_quality(model, raw)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
