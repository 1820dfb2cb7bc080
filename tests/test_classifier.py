"""Quality-classifier training/scoring: separable corpora classify
correctly; the fit is deterministic (convex objective, fixed data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from diseasystore_spark.pipeline.classifier import (
    score_quality,
    train_quality_classifier,
)


def _corpus(spark):
    rows = []
    # "good": prose-like, low punctuation/digits
    for i in range(40):
        rows.append(
            (i, "the quick brown fox jumps over a lazy dog near the river "
                f"bank and rests in the warm afternoon sun {i}", 1)
        )
    # "bad": digit/punct noise
    for i in range(40, 80):
        rows.append((i, f"@@## {i*7} $$%% 12{i} !!! ###{i} 0x{i:x} %%@", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_classifier_separates_and_scores(spark):
    df = _corpus(spark)
    model = train_quality_classifier(df, "label")
    scored = score_quality(df, model)
    joined = scored.join(df.select("doc_id", "label"), "doc_id")
    acc = (
        joined.where(
            F.col("predicted_keep").cast("int") == F.col("label")
        ).count()
        / 80
    )
    assert acc >= 0.95, acc
    probs = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    assert min(probs[i] for i in range(40)) > max(
        probs[i] for i in range(40, 80)
    )


def test_classifier_deterministic_fit(spark):
    df = _corpus(spark)
    c1 = train_quality_classifier(df, "label").coefficients.toArray()
    c2 = train_quality_classifier(df, "label").coefficients.toArray()
    assert (c1 == c2).all()
