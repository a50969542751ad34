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


def _lang_corpus(spark, n_per=120, seed=11):
    """Synthetic separable mini-languages with distinct char-gram
    distributions (the testdata's lang labels are random w.r.t. its
    text, so the learnability pin needs a corpus where the label IS a
    function of the text — three 'scripts' built from disjoint
    syllable inventories)."""
    import random
    rng = random.Random(seed)
    syll = {"aa": ["ka", "to", "mi", "su", "ren"],
            "bb": ["sch", "ung", "ver", "ein", "zel"],
            "cc": ["ois", "eau", "que", "lle", "tre"]}
    rows = []
    did = 0
    for lang, sy in syll.items():
        for _ in range(n_per):
            words = [" ".join(rng.choice(sy) for _ in range(3))
                     for _ in range(rng.randint(5, 15))]
            rows.append((did, lang, " ".join(words)))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_lang_classifier_holdout_accuracy(spark):
    """fastText-style char-gram lang-id recovers the language of
    held-out docs from separable syllable inventories."""
    docs = _lang_corpus(spark)
    train = docs.where(F.col("doc_id") % 5 != 0)
    held = docs.where(F.col("doc_id") % 5 == 0)
    model, labels = classifier.train_lang_classifier(train)
    assert sorted(labels) == ["aa", "bb", "cc"]
    got = (classifier.predict_lang(model, labels, held)
           .join(held.select("doc_id", "lang"), "doc_id").collect())
    assert got
    acc = sum(1 for r in got if r.pred_lang == r.lang) / len(got)
    assert acc >= 0.95, acc
    assert all(0.0 <= r.lang_prob <= 1.0 for r in got)


def test_lang_classifier_scoring_is_map_side(spark):
    """Serving must stay Exchange-free: gram extraction is built-in
    expressions, coefficients ride the broadcast transform."""
    docs = _lang_corpus(spark, n_per=40)
    model, labels = classifier.train_lang_classifier(
        docs.where(F.col("doc_id") % 5 != 0))
    plan = (classifier.predict_lang(model, labels, docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
