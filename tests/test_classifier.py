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


def test_calibration_bins_known_values(spark):
    """A perfectly calibrated synthetic scorer lands pos_rate ==
    mean_score per bin (up to the micro quantization); bin edges clamp
    1.0 into the last bin; out-of-range scores fail loud; NULLs drop."""
    import pytest
    from pyspark.sql import functions as F

    from diseasystore_spark.pipeline.classifier import calibration_bins

    # deterministic "perfectly calibrated" data: for score s = k/10,
    # exactly k of 10 rows are positive
    rows = []
    for k in range(11):  # scores 0.0 .. 1.0
        for i in range(10):
            rows.append((k / 10.0, i < k))
    rows.append((None, True))
    rows.append((0.5, None))
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {r["bin"]: r for r in calibration_bins(df, "score", "label").collect()}
    # score 1.0 clamps into bin 9 alongside 0.9
    assert set(out) == set(range(10))
    assert out[9]["n"] == 20
    for b, r in out.items():
        assert abs(r["mean_score"] - r["pos_rate"]) < 0.06, (b, r)
    # exact micro-derivation at bin 5: mean_score = 0.5 exactly
    assert out[5]["mean_score"] == 0.5 and out[5]["pos_rate"] == 0.5

    bad = spark.createDataFrame([(1.5, True)], "score double, label boolean")
    with pytest.raises(Exception, match="outside"):
        calibration_bins(bad, "score", "label").collect()
    with pytest.raises(ValueError, match="n_bins"):
        calibration_bins(df, "score", "label", n_bins=1)


def test_roc_auc_known_values(spark):
    """Perfect separation = 1.0; hand-computed tie case = 0.875;
    reversed scorer = complement; degenerate label sets fail loud."""
    import pytest

    from diseasystore_spark.pipeline.classifier import roc_auc

    perfect = spark.createDataFrame(
        [(0.9, True)] * 3 + [(0.1, False)] * 4, "s double, y boolean"
    )
    r = roc_auc(perfect, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (3, 4, 1.0)

    ties = spark.createDataFrame(
        [(0.5, True), (0.5, False), (0.7, True), (0.3, False)],
        "s double, y boolean",
    )
    assert roc_auc(ties, "s", "y").collect()[0]["auc"] == 0.875

    rev = ties.selectExpr("1.0 - s AS s", "y")
    assert roc_auc(rev, "s", "y").collect()[0]["auc"] == 1 - 0.875

    mono = spark.createDataFrame([(0.4, True)] * 3, "s double, y boolean")
    with pytest.raises(Exception, match="at least one"):
        roc_auc(mono, "s", "y").collect()
    with pytest.raises(ValueError, match="quantize"):
        roc_auc(ties, "s", "y", quantize=1)


def test_ks_statistic_matches_python_oracle(spark):
    """KS and its argmax threshold against a brute-force Python sweep
    over every distinct quantized score; degenerate one-class frames
    raise."""
    import random as _random

    import pytest

    from diseasystore_spark.pipeline.classifier import ks_statistic

    rng = _random.Random(19)
    rows = [
        ((0.25 + 0.7 * rng.random()) if y else 0.7 * rng.random(), y)
        for y in (rng.random() < 0.4 for _ in range(1500))
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    r = ks_statistic(df, "score", "label").collect()[0]

    import math

    q = lambda s: math.floor(s * 1_000_000)  # noqa: E731
    pos = sorted(q(s) for s, y in rows if y)
    neg = sorted(q(s) for s, y in rows if not y)
    P, N = len(pos), len(neg)
    best, best_q = -1, None
    for t in sorted(set(pos + neg)):
        cp = sum(1 for v in pos if v <= t)
        cn = sum(1 for v in neg if v <= t)
        d = abs(cp * N - cn * P)
        if d > best:
            best, best_q = d, t
    assert (r["n_pos"], r["n_neg"]) == (P, N)
    assert r["ks"] == best / (P * N)
    assert r["ks_threshold"] == best_q / 1_000_000

    one_class = spark.createDataFrame(
        [(0.5, True), (0.6, True)], "score double, label boolean"
    )
    with pytest.raises(Exception, match="positive and one negative"):
        ks_statistic(one_class, "score", "label").collect()


def test_average_precision_matches_python_oracle(spark):
    """AP's scaled-integer numerator against the bucket-atomic Python
    sweep (descending thresholds, inclusive cumulative counts,
    per-bucket floor division); perfect and inverted scorers bound
    the metric."""
    import math
    import random as _random

    import pytest

    from diseasystore_spark.pipeline.classifier import average_precision

    rng = _random.Random(23)
    rows = [
        ((0.25 + 0.7 * rng.random()) if y else 0.7 * rng.random(), y)
        for y in (rng.random() < 0.3 for _ in range(1200))
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    r = average_precision(df, "score", "label").collect()[0]

    from collections import Counter

    q = lambda s: math.floor(s * 1_000_000)  # noqa: E731
    per = Counter()
    for s, y in rows:
        p, n = per.get(q(s), (0, 0)) if False else (0, 0)
    perp, pern = Counter(), Counter()
    for s, y in rows:
        (perp if y else pern)[q(s)] += 1
    P = sum(perp.values())
    tp = tot = 0
    num = 0
    for t in sorted(set(list(perp) + list(pern)), reverse=True):
        tp += perp[t]
        tot += perp[t] + pern[t]
        num += perp[t] * tp * 10**12 // tot
    assert r["ap_p12"] == num
    assert r["ap"] == num / (10**12 * P)

    perfect = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.2, False), (0.1, False)],
        "score double, label boolean",
    )
    assert average_precision(perfect, "score", "label").collect()[0][
        "ap"
    ] == pytest.approx(1.0)
    inverted = spark.createDataFrame(
        [(0.1, True), (0.9, False)], "score double, label boolean"
    )
    assert average_precision(inverted, "score", "label").collect()[0][
        "ap"
    ] == pytest.approx(0.5)


def test_roc_auc_by_group_matches_global_and_handles_one_class(spark):
    """Per-group AUC equals the global roc_auc computed on each slice
    separately; a one-class group rows through with NULL auc."""
    import random as _random

    from diseasystore_spark.pipeline.classifier import roc_auc, roc_auc_by_group

    rng = _random.Random(29)
    rows = []
    for g, sep in [("a", 0.4), ("b", 0.05)]:
        for _ in range(600):
            y = rng.random() < 0.5
            s = rng.random() * (1 - sep) + (sep if y else 0.0)
            rows.append((g, s, y))
    rows += [("c", 0.5, True), ("c", 0.7, True)]  # one-class group
    df = spark.createDataFrame(rows, "g string, score double, label boolean")
    got = {
        r["g"]: r for r in roc_auc_by_group(df, "score", "label", ["g"]).collect()
    }
    for g in ["a", "b"]:
        want = roc_auc(
            df.where(f"g = '{g}'"), "score", "label"
        ).collect()[0]
        assert got[g]["auc"] == want["auc"]
        assert (got[g]["n_pos"], got[g]["n_neg"]) == (
            want["n_pos"], want["n_neg"],
        )
    assert got["a"]["auc"] > got["b"]["auc"]
    assert got["c"]["auc"] is None and got["c"]["n_neg"] == 0
