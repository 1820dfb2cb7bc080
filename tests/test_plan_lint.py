"""plan_summary / assert_distributed — the user-facing plan-shape
gate (plans/lint.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from diseasystore_spark.plans.lint import assert_distributed, plan_summary


def test_partitioned_window_passes(spark):
    df = spark.range(100).withColumn("k", F.col("id") % 3)
    part = df.withColumn(
        "r", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    s = assert_distributed(part)
    assert s["unpartitioned_windows"] == 0 and s["cartesian"] == 0


def test_global_window_flagged_and_cappable(spark):
    df = spark.range(100)
    glob = df.withColumn("r", F.row_number().over(Window.orderBy("id")))
    assert plan_summary(glob)["unpartitioned_windows"] == 1
    with pytest.raises(AssertionError, match="unpartitioned window"):
        assert_distributed(glob)
    # a provably bounded frame may raise the cap explicitly
    assert_distributed(glob, max_unpartitioned_windows=1)


def test_cartesian_flagged(spark):
    a = spark.range(100)
    b = spark.range(50).select(F.col("id").alias("j"))
    cart = a.hint("shuffle_replicate_nl").crossJoin(b)
    assert plan_summary(cart)["cartesian"] >= 1
    with pytest.raises(AssertionError, match="cartesian"):
        assert_distributed(cart)


def test_arrow_python_is_acceptable_row_python_is_not(spark):
    df = spark.range(100).withColumn("v", F.col("id").cast("double"))

    def doubler(it):
        for pdf in it:
            yield pdf.assign(v=pdf.v * 2)

    arrow = df.mapInPandas(doubler, "id long, v double")
    s = assert_distributed(arrow)
    assert s["arrow_python"] == 1 and s["row_python"] == 0

    from pyspark.sql.types import DoubleType

    slow = df.withColumn(
        "w", F.udf(lambda v: v * 2, DoubleType(), useArrow=False)("v")
    )
    assert plan_summary(slow)["row_python"] >= 1
    with pytest.raises(AssertionError, match="BatchEvalPython"):
        assert_distributed(slow)
    assert_distributed(slow, allow_row_python=True)


def test_registry_flagship_is_scale_safe(spark):
    """The flagship engine query passes the gate end-to-end (cumsum
    windows are strata-partitioned, joins never cartesian)."""
    from diseasystore_spark.queries import QUERIES

    df = QUERIES["q12_date_spine"](spark, "/root/testdata/sf0.001")
    s = assert_distributed(df)
    assert s["exchanges"] > 0  # real aggregation plan, not a stub


def test_all_registry_queries_are_scale_safe(spark):
    """Repo-wide plan gate: NO registry query may contain a cartesian
    product or a row-at-a-time Python eval, and unpartitioned windows
    are allowed only where the windowed frame is provably bounded
    (pinned per query below — a new global window anywhere else is a
    regression, not a judgment call).

    Bounded-frame allowances: q01 unstratified cumsum (rows = study
    days), q08 day-level gap spine, q45 top-k rank over the heavy-
    hitter candidates, q64/q66 budget prefix-sum bucket frame
    (coarse_div-bounded), q65 vocab rank (vocab-sized), q75 epoch
    1024-row bucket frame, q103 cumulative-weight windows over KLL sketch rows (three
    consumers; each frame is sketch-bounded, ~K log(n/K) rows), q141
    (same kll_quantiles machinery behind kll_bucketize), q118
    rank over the already-LIMITed top-k search hits (<= k rows), q122
    exclusive prefix over the |partitions|-row range-bucket counts.
    """
    from diseasystore_spark.plans.lint import plan_summary
    from diseasystore_spark.queries import QUERIES

    allowed_global_windows = {
        "q01_prevalence_total": 1,
        "q08_gap_islands": 2,
        "q45_heavy_hitters": 1,
        "q64_budget_selection": 1,
        "q65_tokenize_to_ids": 1,
        "q66_curation_e2e": 1,
        "q75_epoch_shuffle": 1,
        "q103_kll_quantiles": 3,
        "q118_conjunctive_search": 1,
        "q122_equi_depth_histogram": 1,
        "q141_quantile_bucketize": 3,
        # kll_quantiles machinery (sketch-bounded, as q141) appears
        # twice in the staged plan plus the n_stages*1024-row
        # composite-bucket prefix frame of the two-level rank (as q75)
        "q142_curriculum_order": 7,
        # the same sketch-bounded kll_quantiles subtree, instantiated
        # per side (ref/cur) and re-expanded by the unshared boundary
        # broadcast — every frame is sketch-row-sized (~K log(n/K))
        "q143_drift_psi": 12,
        # exclusive prefix over the quantized distinct-score frame
        # (<= quantize+1 rows, the q122 bounded-frame pattern)
        "q151_roc_auc": 1,
        # per-column exclusive prefix over the quantized distinct-
        # VALUE frames (<= quantize+1 rows each, q151's envelope)
        "q159_spearman_scores": 2,
        # inclusive cumulative counts + the 1-group max flag, both
        # over the quantized distinct-score frame
        "q160_ks_statistic": 2,
        # descending inclusive cumulative counts over the same frame
        "q161_average_precision": 1,
        # vocabulary rank (vocab-sized frame, the q65 allowance)
        "q167_zipf_fit": 1,
        # top-k rank over the KEY-cardinality frequency frame (the
        # q45 heavy-hitter allowance)
        "q169_skew_profile": 1,
        # BH rank + step-up max over the HYPOTHESIS frame (m tests,
        # 25 here — never data-sized)
        "q178_bh_fdr_gate": 2,
    }
    problems = []
    for name, fn in QUERIES.items():
        s = plan_summary(fn(spark, "/root/testdata/sf0.001"))
        if s["cartesian"]:
            problems.append(f"{name}: {s['cartesian']} cartesian")
        if s["row_python"]:
            problems.append(f"{name}: {s['row_python']} row-python")
        cap = allowed_global_windows.get(name, 0)
        if s["unpartitioned_windows"] > cap:
            problems.append(
                f"{name}: {s['unpartitioned_windows']} global windows "
                f"(cap {cap})"
            )
        if s.get("plan_guards"):
            # every registry entry is either bounded or an explicit
            # density_guard="off" exact benchmark — an in-plan guard
            # here means a benchmark silently pays the probe subtree
            problems.append(f"{name}: {s['plan_guards']} plan guards")
    assert not problems, "; ".join(problems)
