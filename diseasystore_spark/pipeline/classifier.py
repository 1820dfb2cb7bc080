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

from pyspark.sql import DataFrame, Window
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


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier — the
    calibration QA every quality/toxicity scorer needs before its
    scores gate a corpus (an over-confident filter silently shifts
    the kept distribution): scores in ``[0, 1]`` are cut into
    ``n_bins`` equi-WIDTH bins (``floor(score * n_bins)``, top edge
    clamped into the last bin — the standard ECE binning, fixed-width
    so bins are comparable across models), and each bin reports its
    size, mean score (confidence), and observed positive rate.
    ``sum(n * |mean_score - pos_rate|) / sum(n)`` is the expected
    calibration error; per-bin rows are emitted so the caller sees
    WHERE the scorer is miscalibrated.

    Means are exact-integer derived: scores are aggregated as
    micro-unit bigints (``floor(score * 1e6)``), so the output
    doubles are reproducible bit-for-bit in any SQL engine at the
    cost of 1e-6 quantization of the confidence mean (far below any
    calibration signal). NULL scores/labels are excluded; scores
    outside [0, 1] raise (they are not probabilities).

    Scale shape: one JVM-side bin projection + one combinable groupBy
    on the ``n_bins``-ary key. Output: ``(bin int, n bigint,
    mean_score double, pos_rate double)``.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be at least 2")
    base = df.select(
        F.col(score_col).cast("double").alias("__s"),
        F.col(label_col).cast("boolean").alias("__y"),
    ).where(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    guarded = base.withColumn(
        "__s",
        F.when(
            (F.col("__s") >= 0.0) & (F.col("__s") <= 1.0), F.col("__s")
        ).otherwise(
            F.assert_true(
                F.lit(False), F.lit("calibration_bins: score outside [0, 1]")
            ).cast("double")
        ),
    )
    binned = guarded.select(
        F.least(
            F.floor(F.col("__s") * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        F.floor(F.col("__s") * 1_000_000).cast("bigint").alias("__sm"),
        F.col("__y").cast("int").alias("__yi"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum("__sm").cast("double")
            / (F.count(F.lit(1)) * 1_000_000).cast("double")
        ).alias("mean_score"),
        (
            F.sum("__yi").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("pos_rate"),
    )


def _per_score_counts(
    df: DataFrame, score_col: str, label_col: str, quantize: int
) -> DataFrame:
    """Shared rank-metric substrate: quantize scores to ``1/quantize``
    units and aggregate per-distinct-score positive/negative counts —
    the frame every threshold-sweep metric (ROC-AUC, KS, average
    precision) runs its bounded window over. ≤ quantize+1 rows
    regardless of corpus size; one combinable groupBy."""
    base = df.select(
        F.floor(F.col(score_col).cast("double") * quantize)
        .cast("bigint")
        .alias("__q"),
        F.col(label_col).cast("boolean").alias("__y"),
    ).where(F.col("__q").isNotNull() & F.col("__y").isNotNull())
    return base.groupBy("__q").agg(
        F.sum(F.col("__y").cast("int")).cast("bigint").alias("__p"),
        F.sum((~F.col("__y")).cast("int")).cast("bigint").alias("__n"),
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    quantize: int = 1_000_000,
) -> DataFrame:
    """ROC-AUC of a scorer against a boolean label — the
    rank-quality companion of :func:`calibration_bins` (a filter can
    be well-calibrated yet rank poorly and vice versa; corpus gating
    needs both). Computed as the tie-corrected Mann-Whitney
    statistic: with per-distinct-score positive/negative counts
    ``p_s, n_s`` and the exclusive running negative count ``N_<s``
    in ascending score order,

        AUC = Σ_s p_s · (N_<s + n_s/2) / (P · N)

    kept in EXACT integer arithmetic (the ×2 numerator and the
    ``2·P·N`` denominator as ``decimal(38,0)`` — int64 wraps already
    at ~2.1e9 of each class) until one final double division, so any
    SQL engine reproduces it bit-for-bit up to ~1e19 rows per class. Scores are quantized to ``1/quantize`` units first
    — that bounds the distinct-score frame at ``quantize+1`` rows
    (the prefix window below runs over THAT frame, never the corpus,
    the q122 equi-depth-histogram pattern) and perturbs AUC by at
    most the mass of pairs split across a quantization boundary
    (< 1e-6 resolution at the default).

    NULL scores/labels are excluded; a frame with no positives or no
    negatives raises (AUC is undefined) via a fail-loud assert fused
    into the output expression.

    Output: ONE row — ``(n_pos bigint, n_neg bigint, auc double)``.
    """
    if quantize < 2:
        raise ValueError("quantize must be at least 2")
    per_score = _per_score_counts(df, score_col, label_col, quantize)
    w = (
        Window.orderBy("__q").rowsBetween(Window.unboundedPreceding, -1)
    )
    # The ×2 numerator and the n_pos·n_neg denominator accumulate in
    # decimal(38,0), not int64: at multi-billion positives AND
    # negatives (the 100 TB target) both exceed int64 (2·n_pos·n_neg
    # > 9.2e18 already at ~2.1e9 of each) and would wrap/NULL
    # silently with ANSI off. decimal(38,0) holds them exactly up to
    # ~1e19 rows of each class (2·n_pos·n_neg < 1e38).
    contrib = per_score.select(
        "__p",
        "__n",
        (
            F.col("__p").cast("decimal(38,0)")
            * (
                F.lit(2) * F.coalesce(F.sum("__n").over(w), F.lit(0))
                + F.col("__n")
            ).cast("decimal(38,0)")
        ).alias("__num2"),
    )
    tot = contrib.agg(
        F.sum("__p").cast("bigint").alias("n_pos"),
        F.sum("__n").cast("bigint").alias("n_neg"),
        F.sum("__num2").cast("decimal(38,0)").alias("__num2"),
    )
    ok = F.assert_true(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.lit("roc_auc: need at least one positive and one negative"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        F.when(
            ok.isNull(),
            F.col("__num2").cast("double")
            / (
                F.lit(2)
                * F.col("n_pos").cast("decimal(38,0)")
                * F.col("n_neg").cast("decimal(38,0)")
            ).cast("double"),
        ).alias("auc"),
    )


def ks_statistic(
    df: DataFrame,
    score_col: str,
    label_col: str,
    quantize: int = 1_000_000,
) -> DataFrame:
    """Kolmogorov-Smirnov separation of a scorer's positive vs
    negative score distributions — the classic "how separable are the
    classes at the best single threshold" readout (credit-scoring's
    KS, the max-over-thresholds sibling of :func:`roc_auc`'s
    integral): ``KS = max_t |F_pos(t) - F_neg(t)|``.

    Determinism-first like roc_auc: per-distinct-quantized-score
    counts, one bounded (≤ quantize+1 row) ordered window of
    INCLUSIVE cumulative counts, and the max runs over the exact
    integer cross-difference ``|cum_p·N − cum_n·P|`` (decimal(38,0) —
    products of two corpus-scale counts exceed int64) with one final
    double division by ``P·N``. Any SQL engine reproduces it
    bit-for-bit. A frame with no positives or no negatives raises.

    Output: ONE row — ``(n_pos bigint, n_neg bigint, ks double,
    ks_threshold double)`` where ``ks_threshold`` is the LOWEST
    quantized score attaining the max (deterministic tie-break),
    reported in original score units.
    """
    if quantize < 2:
        raise ValueError("quantize must be at least 2")
    per_score = _per_score_counts(df, score_col, label_col, quantize)
    w = Window.orderBy("__q").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_score.select(
        "__q",
        F.sum("__p").over(w).cast("decimal(38,0)").alias("__cp"),
        F.sum("__n").over(w).cast("decimal(38,0)").alias("__cn"),
    )
    tot = per_score.agg(
        F.sum("__p").cast("bigint").alias("n_pos"),
        F.sum("__n").cast("bigint").alias("n_neg"),
    )
    diff = cum.crossJoin(F.broadcast(tot)).select(
        "__q",
        "n_pos",
        "n_neg",
        F.abs(
            F.col("__cp") * F.col("n_neg").cast("decimal(38,0)")
            - F.col("__cn") * F.col("n_pos").cast("decimal(38,0)")
        ).alias("__d"),
    )
    wall = Window.partitionBy("n_pos", "n_neg")
    best = (
        diff.withColumn("__dmax", F.max("__d").over(wall))
        .groupBy("n_pos", "n_neg", "__dmax")
        .agg(
            F.min(
                F.when(F.col("__d") == F.col("__dmax"), F.col("__q"))
            ).alias("__qbest")
        )
    )
    ok = F.assert_true(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.lit("ks_statistic: need at least one positive and one negative"),
    )
    return best.select(
        "n_pos",
        "n_neg",
        F.when(
            ok.isNull(),
            F.col("__dmax").cast("double")
            / (
                F.col("n_pos").cast("decimal(38,0)")
                * F.col("n_neg").cast("decimal(38,0)")
            ).cast("double"),
        ).alias("ks"),
        (F.col("__qbest").cast("double") / quantize).alias("ks_threshold"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    quantize: int = 1_000_000,
) -> DataFrame:
    """Average precision (PR-AUC, step form) — the rank metric that,
    unlike ROC-AUC, stays honest under heavy class imbalance (the
    usual corpus-curation regime: few good documents, oceans of
    rejects): sweep thresholds from the highest score down, and
    average the precision at each threshold weighted by the recall it
    adds. Distinct quantized scores are treated atomically (all rows
    of a tie enter together — deterministic, no within-tie order).

        AP = Σ_s (p_s / P) · (TP_s / (TP_s + FP_s))

    with TP_s/FP_s the INCLUSIVE cumulative counts in descending
    score order. Determinism-first: each bucket's term is computed as
    ``floor(1e12 · p_s · TP_s / (TP_s + FP_s))`` in decimal(38,0) —
    integer floor-division per bucket, so the cross-bucket sum is an
    exact integer (order-independent, engine-reproducible) and only
    the final division by ``1e12 · P`` is double. The ≤ 1e-12
    per-bucket floor bias is far below any decision threshold; the
    exactness of the VERIFICATION is what matters.

    Output: ONE row — ``(n_pos bigint, n_neg bigint, ap_p12
    decimal(38,0), ap double)`` (``ap_p12`` is the scaled-integer
    numerator — the value the oracle matches exactly).
    """
    if quantize < 2:
        raise ValueError("quantize must be at least 2")
    per_score = _per_score_counts(df, score_col, label_col, quantize)
    w = (
        Window.orderBy(F.col("__q").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_score.select(
        "__p",
        F.sum("__p").over(w).cast("decimal(38,0)").alias("__tp"),
        (F.sum("__p").over(w) + F.sum("__n").over(w))
        .cast("decimal(38,0)")
        .alias("__tot"),
    )
    term = cum.select(
        "__p",
        F.floor(
            F.col("__p").cast("decimal(38,0)")
            * F.col("__tp")
            * F.lit(1_000_000_000_000).cast("decimal(38,0)")
            / F.col("__tot")
        ).cast("decimal(38,0)").alias("__t"),
    )
    tot = term.agg(
        F.sum("__p").cast("bigint").alias("n_pos"),
        F.sum("__t").cast("decimal(38,0)").alias("ap_p12"),
    )
    n_neg = per_score.agg(F.sum("__n").cast("bigint").alias("n_neg"))
    ok = F.assert_true(
        F.col("n_pos") > 0,
        F.lit("average_precision: need at least one positive"),
    )
    return tot.crossJoin(F.broadcast(n_neg)).select(
        "n_pos",
        "n_neg",
        "ap_p12",
        F.when(
            ok.isNull(),
            F.col("ap_p12").cast("double")
            / (
                F.lit(1_000_000_000_000).cast("decimal(38,0)")
                * F.col("n_pos").cast("decimal(38,0)")
            ).cast("double"),
        ).alias("ap"),
    )


def roc_auc_by_group(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str],
    quantize: int = 1_000_000,
) -> DataFrame:
    """Per-segment ROC-AUC — :func:`roc_auc` computed independently
    inside every group: the fairness/segment readout (a scorer can
    rank well globally while inverting inside one language or source;
    gating a corpus with it then skews exactly that slice). Same
    tie-corrected Mann-Whitney integer arithmetic; the cumulative
    window is PARTITIONED by the group (per-group quantized frames,
    each ≤ quantize+1 rows). One-class groups return NULL auc with
    their counts — segment dashboards expect the row, and a global
    assert would let one degenerate slice fail the whole readout
    (the q153 NULL-t convention).

    Output: ``(group_cols..., n_pos bigint, n_neg bigint,
    auc double)``.
    """
    if quantize < 2:
        raise ValueError("quantize must be at least 2")
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    base = df.select(
        *group_cols,
        F.floor(F.col(score_col).cast("double") * quantize)
        .cast("bigint")
        .alias("__q"),
        F.col(label_col).cast("boolean").alias("__y"),
    ).where(F.col("__q").isNotNull() & F.col("__y").isNotNull())
    per_score = base.groupBy(*group_cols, "__q").agg(
        F.sum(F.col("__y").cast("int")).cast("bigint").alias("__p"),
        F.sum((~F.col("__y")).cast("int")).cast("bigint").alias("__n"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = per_score.select(
        *group_cols,
        "__p",
        "__n",
        (
            F.col("__p").cast("decimal(38,0)")
            * (
                F.lit(2) * F.coalesce(F.sum("__n").over(w), F.lit(0))
                + F.col("__n")
            ).cast("decimal(38,0)")
        ).alias("__num2"),
    )
    tot = contrib.groupBy(*group_cols).agg(
        F.sum("__p").cast("bigint").alias("n_pos"),
        F.sum("__n").cast("bigint").alias("n_neg"),
        F.sum("__num2").cast("decimal(38,0)").alias("__num2"),
    )
    return tot.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("__num2").cast("double")
            / (
                F.lit(2)
                * F.col("n_pos").cast("decimal(38,0)")
                * F.col("n_neg").cast("decimal(38,0)")
            ).cast("double"),
        ).alias("auc"),
    )
