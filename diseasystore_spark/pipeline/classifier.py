"""Trainable quality classifier over the text-stats features
(the ML-pipeline integration surface: pyspark.ml, public API).

The GPT-3/LLaMA-style curation step "train a classifier on seed
labels, score the corpus, keep high-scoring documents" — here as a
logistic regression over the SAME per-document statistics
``text_stats`` already computes (token counts, punctuation/digit/
stopword ratios, composite score), so the feature extraction is one
map-side projection and the only iterative cost is the L-BFGS fit on
a k-dimensional problem (k = 6): per-iteration work is a
``treeAggregate`` gradient — embarrassingly parallel, independent of
document length.

Scoring is a pure model transform (JVM-side BLAS dot per row).
Determinism: LogisticRegression's L-BFGS on a fixed dataset converges
to the same coefficients (convex objective); the tests pin separable-
corpus accuracy and train==retrain coefficient equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["QUALITY_FEATURES", "train_quality_classifier", "score_quality"]

QUALITY_FEATURES = [
    "n_tokens",
    "n_distinct_tokens",
    "avg_token_len",
    "punct_ratio",
    "digit_ratio",
    "stopword_ratio",
]


def _feature_frame(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from pyspark.ml.feature import VectorAssembler

    from diseasystore_spark.pipeline.text import text_stats

    stats = text_stats(df, id_col, text_col)
    assembler = VectorAssembler(
        inputCols=QUALITY_FEATURES, outputCol="__features"
    )
    return assembler.transform(stats)


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit a logistic-regression quality model on seed labels
    (``label_col``: 0/1 or boolean). Returns the fitted pyspark.ml
    model; pass it to ``score_quality``."""
    from pyspark.ml.classification import LogisticRegression

    labeled = df.withColumn(
        "__label", F.col(label_col).cast("double")
    )
    feats = _feature_frame(labeled, id_col, text_col).join(
        labeled.select(id_col, "__label"), id_col
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="__label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=True,
    )
    return lr.fit(feats)


def score_quality(
    df: DataFrame,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "quality_prob",
) -> DataFrame:
    """Score every document with the trained model: (id, score_col =
    P(label=1), predicted boolean). Map-only after the stats
    projection."""
    from pyspark.ml.functions import vector_to_array

    feats = _feature_frame(df, id_col, text_col)
    out = model.transform(feats)
    return out.select(
        F.col(id_col),
        vector_to_array(F.col("probability"))[1].alias(score_col),
        (F.col("prediction") == 1.0).alias("predicted_keep"),
    )
