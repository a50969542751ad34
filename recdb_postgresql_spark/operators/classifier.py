"""Model-based document quality / domain classification.

The heuristic quality scores in ``operators.text`` (length, stopword
ratio, repetition) are stage one of a corpus pipeline; stage two in
production (CCNet, fastText-style filtering) is a LINEAR MODEL over
hashed bag-of-words features, trained on weak labels (a trusted
corpus vs crawl noise) and run over every document. This module is
that stage, built on Spark MLlib — hashed features keep the model
O(num_features) regardless of vocabulary, training is distributed
L-BFGS, and scoring is a map-side transform (broadcast coefficient
vector, no shuffle).

Not SQL-expressible (iterative optimization), so the operator is
rows-only for the driver's oracle gate; pytest pins holdout accuracy
on a separable weak-label task plus the scoring contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+"


def train_quality_classifier(docs: DataFrame, label_col: str,
                             text_col: str = "text",
                             num_features: int = 1 << 16,
                             reg: float = 0.01, max_iter: int = 30):
    """Fit hashed-BoW logistic regression on ``label_col`` (0/1 weak
    labels — e.g. "looks like the trusted corpus"). Returns the fitted
    PipelineModel. num_features is the hashing-trick width: collisions
    degrade gracefully and the model size is independent of corpus
    vocabulary — the property that lets the same code train on 100 TB
    without a vocabulary build."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    pipe = Pipeline(stages=[
        RegexTokenizer(inputCol=text_col, outputCol="_toks",
                       pattern=TOKEN_PATTERN, gaps=False,
                       toLowercase=True),
        HashingTF(inputCol="_toks", outputCol="_feat",
                  numFeatures=int(num_features)),
        LogisticRegression(featuresCol="_feat", labelCol=label_col,
                           regParam=float(reg), maxIter=int(max_iter)),
    ])
    return pipe.fit(docs.withColumn(label_col,
                                    F.col(label_col).cast("double")))


def score_quality(model, docs: DataFrame, id_col: str = "doc_id",
                  round_to: int = 4) -> DataFrame:
    """(id, quality_prob): P(label=1) per document — broadcast
    coefficients, map-side only. Round for run-to-run stability of
    the last float digits."""
    from pyspark.ml.functions import vector_to_array

    return (model.transform(docs)
            .select(F.col(id_col),
                    F.round(vector_to_array(F.col("probability"))[1],
                            round_to).alias("quality_prob")))
