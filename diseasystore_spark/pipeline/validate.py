"""Declarative data-quality validation (the dbt-tests /
Great-Expectations-style contract gate, public pattern): evaluate
not-null / range / accepted-values / uniqueness rules over a table
and report violation counts per rule.

Scale shape: every ROW-LEVEL rule compiles into one conditional-sum
column of a SINGLE aggregate over a SINGLE scan — checking 50 rules
costs one pass, not 50. Uniqueness rules are the exception (they are
set-level): each key set adds one map-side-combinable groupBy whose
violation count is ``n_rows - n_distinct_keys``. The report is one
row per rule — unpivoted from the one-row aggregate with ``stack``,
so the output frame is rule-count-sized, never data-sized.

Use it as the ingest gate: ``violations.where("n_violations > 0")``
empty -> promote the batch; else route to quarantine with the report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["validate_contract", "distribution_drift_psi", "annotator_agreement"]


def _viol(cond: Column) -> Column:
    """Count rows where ``cond`` (the VIOLATION predicate) holds;
    NULL predicate results count as violations for range/accepted
    checks only where the caller folds null-handling in."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")


def validate_contract(
    df: DataFrame,
    not_null: list[str] | None = None,
    ranges: dict[str, tuple] | None = None,
    accepted: dict[str, list] | None = None,
    unique: list[list[str]] | None = None,
    custom: dict[str, Column] | None = None,
) -> DataFrame:
    """Violation counts per rule: ``(rule string, n_violations
    bigint)``, one row per declared rule (zero rows violated ⇒ 0).

    - ``not_null``: columns that must not be NULL;
    - ``ranges``: col -> (lo, hi) inclusive bounds (NULL values do
      NOT double-count here — declare the column in ``not_null`` to
      flag them; a NULL comparison is not a range violation);
    - ``accepted``: col -> allowed values (NULLs likewise exempt);
    - ``unique``: key-column lists that must be row-unique;
    - ``custom``: rule name -> boolean Column that is TRUE when the
      row VIOLATES the rule.
    """
    not_null = not_null or []
    ranges = ranges or {}
    accepted = accepted or {}
    unique = unique or []
    custom = custom or {}
    if not (not_null or ranges or accepted or unique or custom):
        raise ValueError("declare at least one rule")
    for cols in unique:
        if not cols:
            raise ValueError("unique rule needs at least one column")

    aggs: list[Column] = []
    names: list[str] = []

    def add(name: str, cond: Column) -> None:
        names.append(name)
        aggs.append(_viol(cond).alias(f"__r{len(names) - 1}"))

    for c in not_null:
        add(f"not_null:{c}", F.col(c).isNull())
    for c, (lo, hi) in ranges.items():
        add(
            f"range:{c}",
            F.col(c).isNotNull()
            & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))),
        )
    for c, vals in accepted.items():
        add(
            f"accepted:{c}",
            F.col(c).isNotNull() & ~F.col(c).isin(list(vals)),
        )
    for name, cond in custom.items():
        add(f"custom:{name}", cond)

    reports: list[DataFrame] = []
    if names:
        wide = df.agg(*aggs)
        # Typed unpivot (explode of array<struct>) instead of a
        # stack() SQL string: rule labels embed caller-supplied
        # column/rule names — F.lit carries them as data, so a name
        # containing a quote can't break the plan.
        rows = F.array(
            *[
                F.struct(
                    F.lit(n).alias("rule"),
                    F.coalesce(
                        F.col(f"__r{i}"), F.lit(0).cast("bigint")
                    ).alias("n_violations"),
                )
                for i, n in enumerate(names)
            ]
        )
        reports.append(
            wide.select(F.explode(rows).alias("__r")).select("__r.*")
        )
    for cols in unique:
        label = f"unique:{','.join(cols)}"
        rep = (
            df.groupBy(*[F.col(c) for c in cols])
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_violations")
            )
            .select(F.lit(label).alias("rule"), "n_violations")
        )
        reports.append(rep)

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def distribution_drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    sketch_k: int = 32768,
    smoothing: int = 1,
) -> DataFrame:
    """Population Stability Index between a REFERENCE sample and a
    CURRENT sample of ``value_col`` — the standard drift monitor for
    corpus snapshots and feature pipelines (PSI < 0.1 stable, 0.1-0.25
    moderate shift, > 0.25 population break; Siddiqi's credit-scoring
    thresholds, public).

    Bins are equi-probable quantiles of the REFERENCE distribution
    (a KLL sketch -> broadcast boundary array, the q141/q142
    machinery — the reference is never sorted), so expected shares
    are ~1/n_bins by construction and the index localizes WHERE the
    current sample left the reference's shape. Counts get
    add-``smoothing`` regularization (a bin the current sample
    misses contributes a finite, large term instead of ln(0)).

    Output: one row per bin — ``(bin int, ref_n bigint, cur_n
    bigint, ref_share double, cur_share double, psi_term double)``;
    ``sum(psi_term)`` is the index. Both shares use smoothed
    denominators, so shares sum to 1 on each side and the math is
    pure double arithmetic over integer counts — reproducible
    bit-for-bit by an external SQL engine in the never-compacted
    sketch regime.

    Scale shape: one sketch pass over the reference, one map-only
    bucket assignment per side (broadcast boundaries, JVM
    higher-order filter), one combinable groupBy per side on the
    ≤ n_bins bucket key, a full outer join of two ≤ n_bins-row
    frames, and 1-row broadcast totals. Nothing data-sized ever
    shuffles on more than the bin key.
    """
    from diseasystore_spark.pipeline.sketch import kll_bucketize, kll_build

    if n_bins < 2:
        raise ValueError("n_bins must be at least 2")
    if smoothing < 1:
        raise ValueError(
            "smoothing must be >= 1 (0 would divide by zero on bins "
            "the current sample misses)"
        )
    # Materialize the sketch: BOTH sides' bucketize calls consume it
    # (each derives its own boundary array), and un-materialized each
    # re-runs the reference sketch-build pass. Sketch-sized rows.
    sk = kll_build(ref, value_col, k=sketch_k).localCheckpoint()

    def _binned(df: DataFrame, out: str) -> DataFrame:
        b = kll_bucketize(
            df.select(value_col), value_col, sk, n_buckets=n_bins
        ).where(F.col("bucket").isNotNull())
        return b.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias(out)
        )

    rc = _binned(ref, "ref_n")
    cc = _binned(cur, "cur_n")
    # Left-join the observed counts onto the FULL 0..n_bins-1 spine:
    # a bin missed by both samples (possible when duplicated reference
    # quantile boundaries leave a bucket unreachable) still emits its
    # row, so sum(psi_term) includes every bin's smoothed contribution
    # and the smoothed shares sum to exactly 1 on each side, as
    # documented. The spine is n_bins literal rows — broadcast, free.
    spine = ref.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    bins = (
        spine.join(
            rc.select(F.col("bucket").cast("int").alias("bin"), "ref_n"),
            "bin",
            "left",
        )
        .join(
            cc.select(F.col("bucket").cast("int").alias("bin"), "cur_n"),
            "bin",
            "left",
        )
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0)).cast("bigint").alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).cast("bigint").alias("cur_n"),
        )
        # n_bins rows; consumed by the totals aggregate AND the final
        # projection — without this both sides' full bucket-count
        # passes re-execute for the totals.
        .localCheckpoint()
    )
    totals = bins.agg(
        F.sum("ref_n").alias("__rt"), F.sum("cur_n").alias("__ct")
    )
    s = float(smoothing)
    p = (F.col("ref_n") + F.lit(s)) / (
        F.col("__rt") + F.lit(s * n_bins)
    ).cast("double")
    q = (F.col("cur_n") + F.lit(s)) / (
        F.col("__ct") + F.lit(s * n_bins)
    ).cast("double")
    return (
        bins.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "ref_n",
            "cur_n",
            p.alias("ref_share"),
            q.alias("cur_share"),
            ((q - p) * F.log(q / p)).alias("psi_term"),
        )
    )


def annotator_agreement(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Cohen's kappa between two label columns — the labeled-data QA
    gate (rater-vs-rater, model-vs-gold, or heuristic-vs-heuristic
    agreement, chance-corrected): ``kappa = (p_o - p_e) / (1 - p_e)``
    with observed agreement ``p_o`` and the chance agreement ``p_e``
    implied by the two marginal label distributions. Rows where
    either label is NULL are excluded (no agreement is defined).

    Output: ONE row — ``(n bigint, observed_agreement double,
    expected_agreement double, kappa double)``. All three doubles
    derive from exact bigint counts (diagonal count and per-label
    marginal products), so any SQL engine reproduces them bit-exactly.
    Perfect agreement over a single label is returned as kappa = 1.0
    (the 0/0 chance-correction case, resolved by convention).

    Scale shape: one combinable groupBy on the (label_a, label_b)
    pair — the confusion matrix, label-cardinality-sized — then
    label-count-sized joins; nothing data-sized shuffles twice.
    """
    pairs = df.select(
        F.col(col_a).cast("string").alias("__a"),
        F.col(col_b).cast("string").alias("__b"),
    ).where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    conf = pairs.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    tot = conf.agg(
        F.sum("__c").alias("__n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))).alias(
            "__diag"
        ),
    )
    ra = conf.groupBy("__a").agg(F.sum("__c").alias("__ra"))
    cb = conf.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    # chance-agreement numerator: sum over labels of row*col marginals
    pe_num = (
        ra.join(cb, ra["__a"] == cb["__b"])
        .agg(F.sum(F.col("__ra") * F.col("__cb")).alias("__pe_num"))
    )
    po = F.coalesce(F.col("__diag"), F.lit(0)) / F.col("__n").cast("double")
    pe = F.coalesce(F.col("__pe_num"), F.lit(0)) / (
        F.col("__n") * F.col("__n")
    ).cast("double")
    return (
        tot.crossJoin(F.broadcast(pe_num))
        .select(
            F.col("__n").cast("bigint").alias("n"),
            po.alias("observed_agreement"),
            pe.alias("expected_agreement"),
            F.when(pe >= 1.0, F.lit(1.0))
            .otherwise((po - pe) / (F.lit(1.0) - pe))
            .alias("kappa"),
        )
    )


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    rater_col: str,
    label_col: str,
) -> DataFrame:
    """Krippendorff's alpha (nominal metric) over a long-form ratings
    frame ``(unit, rater, label)`` — the multi-rater,
    missing-tolerant generalization of :func:`annotator_agreement`'s
    two-rater kappa: any number of raters, any subset rating each
    unit (the real labeling-campaign shape, where labeling functions
    abstain and crowd workers overlap partially). ``alpha = 1 −
    D_o/D_e`` over the coincidence matrix; units with fewer than two
    ratings carry no agreement information and are excluded, NULL
    labels are abstentions.

    Exact-arithmetic derivation (all engine-reproducible):

    - label marginals of the coincidence matrix are PLAIN COUNTS over
      pairable units (``Σ_k o_ck = n_uc`` summed — no division), so
      ``D_e``'s numerator ``n² − Σ_c n_c²`` is exact bigint math;
    - the observed off-diagonal mass ``Σ_u (m_u² − Σ_c n_uc²)/(m_u−1)``
      has per-unit denominators, so it is accumulated EXACTLY by
      grouping units by ``m_u`` (the distinct-rating-count key, tiny)
      and taking ``Σ_m floor(S_m · 1e12 / (m−1))`` in decimal(38,0) —
      integer floor division per group, order-independent, no float
      sum anywhere (the scaled-integer convention of
      ``average_precision``/q149);
    - ``alpha = 1 − (n−1) · o12 / (1e12 · (n² − Σn_c²))`` — one final
      double expression. All-agree frames (zero expected AND observed
      disagreement) return alpha = 1.0 by convention, mirroring the
      kappa operator.

    Output: ONE row — ``(n_units bigint, n_ratings bigint, o_off_p12
    decimal(38,0), alpha double)``.

    Scale shape: one (unit, label) count groupBy, one per-unit
    rollup, one tiny per-m rollup, one label-marginal groupBy —
    all combinable; nothing data-sized shuffles twice.
    """
    ratings = df.select(
        F.col(unit_col).alias("__u"),
        F.col(rater_col).alias("__r"),
        F.col(label_col).cast("string").alias("__c"),
    ).where(
        F.col("__u").isNotNull()
        & F.col("__r").isNotNull()
        & F.col("__c").isNotNull()
    )
    per_unit_label = ratings.groupBy("__u", "__c").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nuc")
    )
    per_unit = per_unit_label.groupBy("__u").agg(
        F.sum("__nuc").cast("bigint").alias("__m"),
        F.sum(F.col("__nuc") * F.col("__nuc")).cast("bigint").alias("__sq"),
    ).where(F.col("__m") >= 2)
    by_m = per_unit.groupBy("__m").agg(
        F.count(F.lit(1)).cast("bigint").alias("__units"),
        F.sum(F.col("__m") * F.col("__m") - F.col("__sq"))
        .cast("bigint")
        .alias("__s"),
    )
    off = by_m.agg(
        F.sum("__units").cast("bigint").alias("n_units"),
        F.sum(F.col("__m") * F.col("__units")).cast("bigint").alias(
            "n_ratings"
        ),
        F.sum(
            F.floor(
                F.col("__s").cast("decimal(38,0)")
                * F.lit(1_000_000_000_000).cast("decimal(38,0)")
                / (F.col("__m") - 1).cast("decimal(38,0)")
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("o_off_p12"),
    )
    marg = (
        per_unit_label.join(per_unit.select("__u"), "__u", "left_semi")
        .groupBy("__c")
        .agg(F.sum("__nuc").cast("bigint").alias("__nc"))
        .agg(
            F.sum(F.col("__nc") * F.col("__nc"))
            .cast("decimal(38,0)")
            .alias("__sum_nc2")
        )
    )
    n = F.col("n_ratings").cast("decimal(38,0)")
    de_num = (n * n - F.col("__sum_nc2")).cast("decimal(38,0)")
    return off.crossJoin(F.broadcast(marg)).select(
        "n_units",
        "n_ratings",
        "o_off_p12",
        F.when(
            de_num > 0,
            F.lit(1.0)
            - (
                (n - 1) * F.col("o_off_p12")
            ).cast("double")
            / (
                F.lit(1_000_000_000_000).cast("decimal(38,0)") * de_num
            ).cast("double"),
        )
        .when(F.col("o_off_p12") == 0, F.lit(1.0))
        .alias("alpha"),
    )


def bh_fdr(
    df: DataFrame,
    p_micro_col: str,
    alpha_micro: int = 50_000,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Benjamini-Hochberg FDR gate over a frame of test results (one
    row per hypothesis, p-values in exact micro-units — the output
    convention of ``permutation_test_by_group``): rank the m
    p-values ascending, find the LARGEST rank k with
    ``p_(k) ≤ k·α/m``, and declare ranks 1..k significant. The
    multiple-testing control every fleet-of-A/B-readouts dashboard
    needs — at 500 segments, α=0.05 yields ~25 false flags without
    it.

    All comparisons are integer cross-multiplications
    (``p_micro·m ≤ rank·alpha_micro``) — no division, engine-exact.
    The rank window runs over the HYPOTHESIS frame (m rows — tests,
    not data; ties in p break by the remaining column values via the
    caller's ordering being irrelevant: BH depends only on the
    sorted p sequence, and equal p's are either all in or all out by
    the step-up rule, which the max-k form below preserves).

    NULL handling: a hypothesis with a NULL p-value cannot be ranked
    — it rows THROUGH with ``p_rank`` NULL and ``significant`` false,
    and does NOT count toward m (BH's m is the number of tests that
    produced a p-value; inflating it with un-testable rows would only
    make the gate conservative in an undocumented way).

    Output: input columns + ``(p_rank int, significant boolean)`` —
    every input row appears exactly once.
    """
    from pyspark.sql import Window as W

    if alpha_micro <= 0 or alpha_micro > 1_000_000:
        raise ValueError("alpha_micro must be in (0, 1e6]")
    # The hypothesis frame is consumed THREE times below (ranked
    # branch, NULL-p branch, and the m count) — without materializing
    # it, the caller's entire upstream pipeline executes three times
    # (measured on q178: the 63x permutation explode ran 3x, plan
    # showed the Generate subtree triplicated). The frame is m rows —
    # tests, not data — so the checkpoint is O(hypotheses) at any
    # scale.
    df = df.localCheckpoint()
    p = F.col(p_micro_col).cast("bigint")
    base = df.where(p.isNotNull())
    nullp = df.where(p.isNull()).select(
        *df.columns,
        F.lit(None).cast("int").alias("p_rank"),
        F.lit(False).alias("significant"),
    )
    m_frame = base.agg(F.count(F.lit(1)).cast("bigint").alias("__m"))
    wr = W.orderBy(p.asc(), *[F.col(c).asc() for c in (tiebreak_cols or [])])
    ranked = (
        base.crossJoin(F.broadcast(m_frame))
        .withColumn("__r", F.row_number().over(wr).cast("bigint"))
        .withColumn(
            "__pass",
            p * F.col("__m") <= F.col("__r") * F.lit(int(alpha_micro)),
        )
    )
    wk = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    out = ranked.withColumn(
        "__k",
        F.max(F.when(F.col("__pass"), F.col("__r"))).over(wk),
    )
    return out.select(
        *df.columns,
        F.col("__r").cast("int").alias("p_rank"),
        F.coalesce(
            F.col("__r") <= F.col("__k"), F.lit(False)
        ).alias("significant"),
    ).unionByName(nullp)
