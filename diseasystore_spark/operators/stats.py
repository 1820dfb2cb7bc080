"""Robust grouped statistics: winsorized moments and OLS trends.

Deterministic-by-construction: both operators do all corpus-sized
summation in INTEGER arithmetic (bigint sums of integer-valued
measures) and convert to floating point only in final, per-group
scalar expressions — so results are bit-reproducible across engines
and partitionings, unlike a naive ``avg(double)`` whose value depends
on the order partial sums combine in.

Scale shape (the 100 TB lens):

- ``winsorized_stats`` is two keyed aggregations over the same
  grouping: pass 1 computes the per-group percentile thresholds
  (Spark's exact ``percentile`` — a per-group sort bounded by the
  group's row count), pass 2 re-aggregates with the thresholds
  joined back on the group key. The threshold frame has one row per
  group, so the join back is a broadcast.
- ``group_trend`` is ONE map-side-combinable aggregation: the five
  OLS sufficient statistics (n, Σx, Σy, Σxy, Σx²) are plain integer
  sums, and slope/intercept are derived per group afterwards. No
  window, no second pass, no driver collect.

Reference parity: the diseasystore reference exposes only sum/max/
min/count aggregators (R/aggregators.R); robust moments and trend
fitting belong to the large-scale analytics extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    p_lo: float = 0.1,
    p_hi: float = 0.9,
) -> DataFrame:
    """Per-group winsorized mean of an INTEGER-valued measure: values
    below the ``p_lo`` quantile are clamped up to it, values above
    ``p_hi`` clamped down, and the mean is taken over the clamped
    series — the outlier-robust location estimate.

    Exactness contract: ``value_col`` must be integral (cents, counts,
    micro-units). Quantile thresholds use linear interpolation at
    position ``(n-1)·p`` (Spark ``percentile`` == DuckDB
    ``quantile_cont`` semantics). The winsorized sum is assembled as
    ``n_lo·lo + n_hi·hi + Σ(unclipped integers)`` — one bigint sum
    plus two scalar products — so no float accumulates across rows
    and the mean is order-independent.

    Output per group: ``(group..., n bigint, lo double, hi double,
    n_clip_lo bigint, n_clip_hi bigint, mean_winsorized double)``.
    """
    if not 0.0 <= p_lo <= p_hi <= 1.0:
        raise ValueError("need 0 <= p_lo <= p_hi <= 1")
    v = F.col(value_col).cast("bigint")
    thresholds = df.groupBy(*group_cols).agg(
        F.percentile(v, F.lit(p_lo)).alias("lo"),
        F.percentile(v, F.lit(p_hi)).alias("hi"),
    )
    joined = df.join(F.broadcast(thresholds), group_cols)
    below = v.cast("double") < F.col("lo")
    above = v.cast("double") > F.col("hi")
    agg = joined.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.sum(below.cast("bigint")).cast("bigint").alias("n_clip_lo"),
        F.sum(above.cast("bigint")).cast("bigint").alias("n_clip_hi"),
        F.sum(F.when(~below & ~above, v).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("__sum_mid"),
    )
    wins_sum = (
        F.col("n_clip_lo").cast("double") * F.col("lo")
        + F.col("n_clip_hi").cast("double") * F.col("hi")
        + F.col("__sum_mid").cast("double")
    )
    return agg.select(
        *group_cols,
        "n",
        "lo",
        "hi",
        "n_clip_lo",
        "n_clip_hi",
        (wins_sum / F.col("n").cast("double")).alias("mean_winsorized"),
    )


def group_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group ordinary-least-squares line fit of INTEGER series
    ``y`` against INTEGER regressor ``x`` via the five sufficient
    statistics, kept in bigint until the final per-group division::

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    Output: ``(group..., n, sum_x, sum_y, sum_xy, sum_xx bigints,
    slope double, intercept double)``; slope/intercept NULL when the
    regressor is constant (zero denominator). The sums are map-side
    combinable, so this is one shuffle of five counters per group —
    the trend over a trillion rows costs the same exchange as a
    count. Overflow note: bigint holds Σxy to ~9.2e18; for measures
    beyond that scale, pre-divide x into coarser units.
    """
    x = F.col(x_col).cast("bigint")
    y = F.col(y_col).cast("bigint")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("bigint").alias("sum_x"),
        F.sum(y).cast("bigint").alias("sum_y"),
        F.sum(x * y).cast("bigint").alias("sum_xy"),
        F.sum(x * x).cast("bigint").alias("sum_xx"),
    )
    n = F.col("n")
    denom = n * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x")
    slope = F.when(
        denom != 0,
        (n * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y"))
        .cast("double")
        / denom.cast("double"),
    )
    intercept = F.when(
        denom != 0,
        (
            F.col("sum_y").cast("double")
            - slope * F.col("sum_x").cast("double")
        )
        / n.cast("double"),
    )
    return agg.select(
        *group_cols,
        "n",
        "sum_x",
        "sum_y",
        "sum_xy",
        "sum_xx",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    """Equal-frequency (equi-depth) histogram of an integer-valued
    column — the ANALYZE-statistics primitive (optimizer histograms,
    drift monitors, quantile-bucket feature encoders). Bucket
    assignment follows exact ``NTILE(n_buckets) OVER (ORDER BY v)``
    semantics: with n rows, the first ``n % k`` buckets hold
    ``n//k + 1`` rows, the rest ``n//k``.

    Output: ``(bucket int 0-based, n_rows bigint, lo bigint, hi
    bigint)`` — per-bucket count and value range. NULLs are excluded
    (no order position). Ties spanning a bucket boundary are split by
    count exactly like NTILE; the (count, lo, hi) summary is
    invariant to which tied row lands where, so the result is
    deterministic even though tie order is not.

    Scale shape — the naive ``ntile() OVER (ORDER BY v)`` is a
    single-task global sort. Here ranks come from the two-level
    pattern over RANGE partitions (equal-frequency level-1 split, so
    a skewed value distribution cannot hot-spot one task the way a
    fixed-width value split would): ``repartitionByRange`` on the
    value, per-partition counts (a |partitions|-row frame), an
    exclusive prefix over that tiny frame, and an intra-partition
    ``row_number``. Only the |partitions|-row window is single-task.
    The NTILE closed form then maps global rank -> bucket in integer
    arithmetic, and one combinable groupBy emits the histogram.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    spark = df.sparkSession
    n_part = partitions or spark.sparkContext.defaultParallelism * 4
    base = (
        df.select(F.col(value_col).cast("bigint").alias("__v"))
        .where(F.col("__v").isNotNull())
        .repartitionByRange(n_part, F.col("__v"))
        .withColumn("__p", F.spark_partition_id())
    )
    counts = base.groupBy("__p").agg(F.count(F.lit(1)).alias("__n"))
    from pyspark.sql import Window

    gw = Window.orderBy("__p").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = counts.select(
        "__p",
        F.coalesce(F.sum("__n").over(gw), F.lit(0)).alias("__prefix"),
    )
    total = counts.agg(F.sum("__n").cast("bigint").alias("__total"))
    iw = Window.partitionBy("__p").orderBy("__v")
    ranked = (
        base.join(F.broadcast(prefixes), "__p")
        .withColumn(
            "__r", F.col("__prefix") + F.row_number().over(iw) - 1
        )
        .crossJoin(F.broadcast(total))
    )
    # NTILE closed form in integer arithmetic (DIV is SQL integer
    # division; Column has no // operator): with q = n DIV k and
    # rem = n % k, the first rem buckets hold q+1 rows.
    bucket = F.expr(
        f"CASE WHEN __total DIV {n_buckets} = 0 THEN __r "
        f"WHEN __r < (__total % {n_buckets}) * (__total DIV {n_buckets} + 1) "
        f"THEN __r DIV (__total DIV {n_buckets} + 1) "
        f"ELSE (__total % {n_buckets}) "
        f"  + (__r - (__total % {n_buckets}) * (__total DIV {n_buckets} + 1)) "
        f"    DIV (__total DIV {n_buckets}) END"
    )
    return (
        ranked.select(bucket.cast("int").alias("bucket"), "__v")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
        )
    )


def ewma_smooth(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.25,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key over an ordered
    series: ``s_1 = x_1``, ``s_t = alpha * x_t + (1 - alpha) *
    s_{t-1}`` — the standard surveillance smoother applied downstream
    of the reference's daily prevalence/incidence series (reference
    emits the raw series via ``get_feature``; smoothing belongs to
    this extension surface, like ``rolling_incidence``).

    Output: the key columns, ``order_col``, ``value_col`` (cast to
    double) and ``out_col`` (double).

    The recursion is inherently sequential IN t, so this is one
    shuffle on the key followed by an Arrow-batched per-key pass
    (``applyInPandas``): each key's series is smoothed in a single
    task. That is the right 100 TB shape for time series, whose
    per-key length is calendar-bounded (a decade of days is ~3.7k
    rows) while the KEY count carries the data volume — keys
    parallelize across executors. Rows with a NULL order or value are
    excluded (they cannot be placed in / contribute to the
    recursion). Ties on ``order_col`` within a key are rejected: the
    recursion's result would depend on their arbitrary order.

    Cross-engine exactness: with ``alpha`` exactly representable in
    binary (default 0.25) the update is two IEEE-double multiplies
    and an add in a fixed order, so a SQL engine replaying the same
    recursion (e.g. a recursive CTE) reproduces the series bit for
    bit.
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")

    clean = df.where(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        *key_cols,
        F.col(order_col),
        F.col(value_col).cast("double").alias(value_col),
    )
    fields = {f.name: f.dataType.simpleString() for f in clean.schema}
    out_schema = ", ".join(
        [f"`{c}` {fields[c]}" for c in key_cols]
        + [f"`{order_col}` {fields[order_col]}"]
        + [f"`{value_col}` double", f"`{out_col}` double"]
    )
    a = float(alpha)
    b = 1.0 - a

    def smooth(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col, kind="mergesort")
        if pdf[order_col].duplicated().any():
            raise ValueError(
                f"ewma_smooth: duplicate {order_col!r} within a key — "
                "recursion order would be ambiguous"
            )
        out = []
        s = None
        for x in pdf[value_col].tolist():
            s = x if s is None else a * x + b * s
            out.append(s)
        pdf = pdf.copy()
        pdf[out_col] = pd.Series(out, index=pdf.index, dtype="float64")
        return pdf[list(key_cols) + [order_col, value_col, out_col]]

    return clean.groupBy(*key_cols).applyInPandas(smooth, schema=out_schema)


def cusum_changepoints(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    drift_col: str,
    threshold_mult: int = 3,
) -> DataFrame:
    """One-sided CUSUM change detection per key over an integer
    series: ``S_0 = 0``, ``S_t = max(0, S_{t-1} + (x_t - k))`` with
    per-key integer drift allowance ``k`` (``drift_col``), flagging
    ``S_t > h`` where ``h = threshold_mult * k`` — the classic
    Page (1954) sequential changepoint statistic epi teams run on
    daily incidence.

    The recursion LOOKS sequential, but has the closed form
    ``S_t = P_t - min(0, min_{i<=t} P_i)`` over the prefix sums
    ``P_t = sum_{i<=t} (x_i - k)`` — so the whole operator is two
    frame-bounded window aggregates (running sum + running min) in
    one window sort, fully JVM-side, no Python and no per-row state.
    All arithmetic is bigint, hence bit-reproducible anywhere.

    Output: key cols, ``order_col``, ``value_col``, ``cusum``
    (bigint) and ``flagged`` (boolean).
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    if threshold_mult <= 0:
        raise ValueError("threshold_mult must be positive")
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    frame = w.rowsBetween(Window.unboundedPreceding, 0)
    d = F.col(value_col).cast("bigint") - F.col(drift_col).cast("bigint")
    staged = df.select(
        *key_cols,
        F.col(order_col),
        F.col(value_col).cast("bigint").alias(value_col),
        F.col(drift_col).cast("bigint").alias("__k"),
        F.sum(d).over(frame).alias("__p"),
    ).withColumn("__pmin", F.min("__p").over(frame))
    s = F.col("__p") - F.least(F.lit(0).cast("bigint"), F.col("__pmin"))
    return staged.select(
        *key_cols,
        F.col(order_col),
        F.col(value_col),
        s.cast("bigint").alias("cusum"),
        (s > F.lit(int(threshold_mult)) * F.col("__k")).alias("flagged"),
    )


def benford_digits(
    df: DataFrame,
    amount_col: str,
) -> DataFrame:
    """First-significant-digit distribution of a monetary column vs
    Benford's law — the standard fraud/data-entry audit. The digit is
    extracted from the INTEGER-CENTS decimal string (no float log10
    at digit boundaries), so counts are exact; only the expected
    Benford share log10(1 + 1/d) and the excess are doubles.

    Output per digit 1..9: ``(digit int, n bigint, p_obs double,
    p_benford double, excess double)``. One combinable 9-key groupBy
    + a 1-row total broadcast-crossed back; rows with non-positive or
    NULL amounts are excluded (no first significant digit).
    """
    cents = F.round(F.col(amount_col) * 100).cast("bigint")
    digits = (
        df.where(F.col(amount_col).isNotNull() & (cents > 0))
        .select(
            F.substring(cents.cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = digits.agg(F.sum("n").cast("bigint").alias("__total"))
    p_obs = F.col("n").cast("double") / F.col("__total").cast("double")
    p_ben = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return (
        digits.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            p_obs.alias("p_obs"),
            p_ben.alias("p_benford"),
            (p_obs - p_ben).alias("excess"),
        )
    )


def gini_by_group(
    df: DataFrame,
    group_cols: list[str],
    amount_col: str,
) -> DataFrame:
    """Gini inequality coefficient per group over a monetary column,
    on integer cents: with the group's positive amounts sorted
    ascending and ranked 1..n,
    ``gini = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))``
    — every term a bigint, one final double division. The rank is a
    per-group window (tie order does not change ``sum(i * x_i)``
    because tied ranks carry equal ``x``), the rest is one combinable
    aggregate. Non-positive/NULL amounts are excluded (Gini is
    defined on positive wealth).

    Output: group cols, ``n bigint, total_c bigint, gini double``.
    """
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    cents = F.round(F.col(amount_col) * 100).cast("bigint")
    w = Window.partitionBy(*group_cols).orderBy(F.col("__x"))
    ranked = (
        df.where(F.col(amount_col).isNotNull() & (cents > 0))
        .select(*group_cols, cents.alias("__x"))
        .withColumn("__i", F.row_number().over(w).cast("bigint"))
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").cast("bigint").alias("total_c"),
        F.sum(F.col("__i") * F.col("__x")).cast("bigint").alias("__ix"),
    )
    return agg.select(
        *group_cols,
        "n",
        "total_c",
        (
            (
                F.lit(2) * F.col("__ix")
                - (F.col("n") + F.lit(1)) * F.col("total_c")
            ).cast("double")
            / (F.col("n") * F.col("total_c")).cast("double")
        ).alias("gini"),
    )


def welch_t_by_group(
    df: DataFrame,
    group_cols: list[str],
    arm_col: str,
    metric_cents_col: str,
) -> DataFrame:
    """Per-group Welch two-sample t statistic between the two arms of
    ``arm_col`` (boolean: True = treatment) over an INTEGER-CENTS
    metric — the experimentation / A-B readout primitive, determinism-
    first: per-arm n / Σx / Σx² accumulate as ``decimal(38,0)``
    (exact, order-independent — double sums would be reduction-order
    dependent and engine-divergent), and only the final mean/variance/
    t arithmetic is double. Welch form (unequal variances):

        t = (m_t - m_c) / sqrt(v_t/n_t + v_c/n_c),  v = sample var

    Groups missing an arm, or with an arm of size < 2, return NULL t
    (undefined) rather than failing — A/B dashboards expect the row.

    Overflow envelope (fail-loud, not silent): each x² stays inside
    decimal(38,0) for any int64-range cents value (|x| ≤ 9.2e18 →
    x² ≤ 8.5e37 < 1e38), so only the per-arm Σx² can overflow —
    at ``n · max(x)² ≥ 1e38``, e.g. ≥1e20 rows of $10M amounts.
    With ANSI mode off Spark would yield a NULL sum there, which the
    naive form reads as "no rows"; this operator instead raises on
    the contradiction (NULL sum with a positive arm count), keeping
    the determinism-first contract: exact or an error, never a
    silently wrong t.

    Scale shape: ONE map-side-combinable aggregate over (group, six
    conditional sums); nothing else. Output per group:
    ``(group_cols..., n_t, n_c bigint, mean_t, mean_c, t double)``.
    """
    y = F.col(arm_col).cast("boolean")
    x = F.col(metric_cents_col).cast("decimal(38,0)")
    agg = df.where(y.isNotNull() & x.isNotNull()).groupBy(
        *group_cols
    ).agg(
        F.sum(F.when(y, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(~y, 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum(F.when(y, x)).alias("__st"),
        F.sum(F.when(~y, x)).alias("__sc"),
        F.sum(F.when(y, x * x)).alias("__qt"),
        F.sum(F.when(~y, x * x)).alias("__qc"),
    )
    # Fail-loud overflow guard: a NULL Σx / Σx² alongside a positive
    # arm count can only mean decimal(38,0) overflow (inputs were
    # filtered non-NULL) — raise instead of propagating NULL stats.
    def _guarded(sum_name: str, n_name: str) -> F.Column:
        return F.when(
            (F.col(n_name) > 0) & F.col(sum_name).isNull(),
            F.raise_error(
                F.lit(
                    f"welch_t_by_group: decimal(38,0) overflow in {sum_name}"
                    " (group too large for the cents magnitude; see the"
                    " overflow envelope in the docstring)"
                )
            ).cast("decimal(38,0)"),
        ).otherwise(F.col(sum_name))

    agg = agg.withColumns(
        {
            "__st": _guarded("__st", "n_t"),
            "__sc": _guarded("__sc", "n_c"),
            "__qt": _guarded("__qt", "n_t"),
            "__qc": _guarded("__qc", "n_c"),
        }
    )
    mt = F.col("__st").cast("double") / F.col("n_t")
    mc = F.col("__sc").cast("double") / F.col("n_c")
    # sample variance from exact sums: (Σx² - (Σx)²/n) / (n-1)
    vt = (
        F.col("__qt").cast("double")
        - F.col("__st").cast("double") * F.col("__st").cast("double")
        / F.col("n_t")
    ) / (F.col("n_t") - F.lit(1))
    vc = (
        F.col("__qc").cast("double")
        - F.col("__sc").cast("double") * F.col("__sc").cast("double")
        / F.col("n_c")
    ) / (F.col("n_c") - F.lit(1))
    defined = (F.col("n_t") >= 2) & (F.col("n_c") >= 2)
    return agg.select(
        *group_cols,
        "n_t",
        "n_c",
        F.when(F.col("n_t") > 0, mt).alias("mean_t"),
        F.when(F.col("n_c") > 0, mc).alias("mean_c"),
        F.when(
            defined,
            (mt - mc) / F.sqrt(vt / F.col("n_t") + vc / F.col("n_c")),
        ).alias("t"),
    )


def spearman_rho(
    df: DataFrame,
    col_a: str,
    col_b: str,
    quantize: int = 1_000_000,
) -> DataFrame:
    """Spearman rank correlation between two score columns — the
    scorer-agreement readout (does the new quality model ORDER the
    corpus like the old one / like human ratings?), robust to any
    monotone rescaling the Pearson correlation would reward or
    punish. Tie-aware: computed as the Pearson correlation of
    AVERAGE ranks, the standard tie correction (the n(n²-1)/6
    shortcut is tie-free only).

    Determinism-first shape: scores quantize to ``1/quantize`` units
    (bounding every intermediate frame at quantize+1 rows — the
    q151/roc_auc pattern; Spearman of the quantized scores, with the
    same ≤1e-6 boundary caveat). Per-distinct-value counts give each
    value's DOUBLED average rank as an exact integer
    (``2·count_less + count + 1``) via one bounded cumulative window
    per column; ranks join back to rows on the bounded value key, and
    the five Pearson sums accumulate as decimal(38,0) — so rho is one
    double expression over exact integers, bit-reproducible in any
    SQL engine. NULLs in either column drop the row; a frame where
    either column is constant returns NULL rho (undefined).

    Output: ONE row — ``(n bigint, rho double)``.

    Scale shape: two combinable value-count groupBys, two bounded
    windows over value-level frames, two equi-joins on the bounded
    value key (broadcastable), one combinable final aggregate. No
    corpus-sized window anywhere.
    """
    if quantize < 2:
        raise ValueError("quantize must be at least 2")
    base = df.select(
        F.floor(F.col(col_a).cast("double") * quantize)
        .cast("bigint")
        .alias("__qa"),
        F.floor(F.col(col_b).cast("double") * quantize)
        .cast("bigint")
        .alias("__qb"),
    ).where(F.col("__qa").isNotNull() & F.col("__qb").isNotNull())

    def ranks(col: str, out: str) -> DataFrame:
        counts = base.groupBy(col).agg(
            F.count(F.lit(1)).cast("bigint").alias("__c")
        )
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return counts.select(
            col,
            (
                F.lit(2) * F.coalesce(F.sum("__c").over(w), F.lit(0))
                + F.col("__c")
                + F.lit(1)
            ).cast("bigint").alias(out),
        )

    ranked = base.join(ranks("__qa", "__ra"), "__qa").join(
        ranks("__qb", "__rb"), "__qb"
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d("__ra")).cast("decimal(38,0)").alias("__sa"),
        F.sum(d("__rb")).cast("decimal(38,0)").alias("__sb"),
        F.sum(d("__ra") * d("__ra")).cast("decimal(38,0)").alias("__saa"),
        F.sum(d("__rb") * d("__rb")).cast("decimal(38,0)").alias("__sbb"),
        F.sum(d("__ra") * d("__rb")).cast("decimal(38,0)").alias("__sab"),
    )
    nn = F.col("n").cast("decimal(38,0)")
    cov = (nn * F.col("__sab") - F.col("__sa") * F.col("__sb")).cast("double")
    va = (nn * F.col("__saa") - F.col("__sa") * F.col("__sa")).cast("double")
    vb = (nn * F.col("__sbb") - F.col("__sb") * F.col("__sb")).cast("double")
    return sums.select(
        "n",
        F.when(
            (va > 0) & (vb > 0), cov / F.sqrt(va * vb)
        ).alias("rho"),
    )


def group_quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantize: int = 1_000_000,
    out_col: str = "pct_micro",
) -> DataFrame:
    """Within-group quantile normalization of a score column: each
    row gets its value's mid-rank percentile INSIDE its group, as an
    exact micro-unit integer — the cross-source score equalizer (a
    quality scorer systematically biased per source ranks documents
    fairly within a source but not across; normalizing to within-
    source percentiles makes one global threshold meaningful).

    ``pct_micro = floor((2·count_less + count) · 1e6 / (2·n_group))``
    — the tie-aware mid-rank (average of the tied block's positions)
    over values quantized to ``1/quantize`` units. All integer
    arithmetic (one floor division per VALUE, not per row), so any
    SQL engine reproduces every output; range (0, 1e6).

    NULL handling: rows with a NULL ``value_col`` are dropped (no
    rank is defined for them); a NULL GROUP key is a legitimate
    group — it ranks within the NULL stratum, matching ``groupBy``
    semantics (the join back to rows is null-safe, so a corpus with
    a NULL source slice keeps every row).

    Scale shape: one combinable (group, value) count, one cumulative
    window per group over the VALUE-level frame (bounded by distinct
    quantized values, and partitioned — never global; the group size
    is an unbounded window sum over the same frame, no extra join),
    and one null-safe equi-join back to rows on the (group, value)
    key. Output: input columns + ``out_col`` (bigint).
    """
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    if quantize < 2:
        raise ValueError("quantize must be at least 2")
    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists")
    q = F.floor(F.col(value_col).cast("double") * quantize).cast("bigint")
    base = df.where(F.col(value_col).isNotNull()).withColumn("__qv", q)
    counts = base.groupBy(*group_cols, "__qv").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__qv")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # group size as an unbounded window sum over the counts frame —
    # shares the cumulative window's partitioning (no extra join),
    # and partitionBy treats a NULL group key as its own partition
    wn = Window.partitionBy(*group_cols)
    ranked = counts.withColumn(
        "__less", F.coalesce(F.sum("__c").over(w), F.lit(0))
    ).select(
        *group_cols,
        "__qv",
        F.floor(
            (F.lit(2) * F.col("__less") + F.col("__c"))
            .cast("decimal(38,0)")
            * F.lit(1_000_000).cast("decimal(38,0)")
            / (F.lit(2) * F.sum("__c").over(wn)).cast("decimal(38,0)")
        )
        .cast("bigint")
        .alias(out_col),
    )
    # null-safe join back: a NULL group key must match its own
    # stratum, not vanish (plain equi-join never matches NULL keys) —
    # the shared operators/_util.null_safe_on policy
    from diseasystore_spark.operators._util import null_safe_on

    cond = (
        F.col("b.__qv") == F.col("r.__qv")
    ) & null_safe_on("b", "r", group_cols)
    return (
        base.alias("b")
        .join(ranked.alias("r"), cond)
        .select(
            *[F.col(f"b.{c}") for c in base.columns if c != "__qv"],
            F.col(f"r.{out_col}"),
        )
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-square test statistic of independence between two
    categorical columns (+ Cramér's V effect size) — the categorical
    companion of :func:`~diseasystore_spark.pipeline.validate.
    distribution_drift_psi`: is language independent of source? Did
    the label mix shift across shards? NULL in either column drops
    the row.

    ``chi2 = Σ_cells (O − E)²/E`` with ``E = R·C/N`` over the FULL
    r×c cell spine (zero-observed cells contribute their expected
    mass — omitting them understates the statistic). Each cell's
    term is one fixed double expression over exact integer marginals,
    floored to micro-units, and the cross-cell sum is an exact
    integer — order-independent, engine-reproducible; ``chi2`` and
    ``cramers_v = sqrt(chi2 / (N·min(r−1, c−1)))`` are final double
    expressions. The statistic is returned, not a p-value: CDF tails
    are not engine-portable — compare against the caller's chi-square
    table at ``dof``.

    Scale shape: one combinable (a, b) count shuffle; marginals,
    spine (r×c, categorical-bounded), and the final sum all run on
    cell-count-sized frames.

    Output: ONE row — ``(n bigint, r int, c int, dof int, chi2_micro
    bigint, chi2 double, cramers_v double)``.
    """
    base = df.select(
        F.col(col_a).cast("string").alias("__a"),
        F.col(col_b).cast("string").alias("__b"),
    ).where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    cells = base.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__o")
    )
    ra = cells.groupBy("__a").agg(F.sum("__o").cast("bigint").alias("__ra"))
    cb = cells.groupBy("__b").agg(F.sum("__o").cast("bigint").alias("__cb"))
    tot = cells.agg(
        F.sum("__o").cast("bigint").alias("__n"),
        F.count_distinct("__a").cast("int").alias("r"),
        F.count_distinct("__b").cast("int").alias("c"),
    )
    spine = ra.crossJoin(cb)  # r x c, categorical-bounded
    joined = (
        spine.join(cells, ["__a", "__b"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.coalesce("__o", F.lit(0)).cast("double").alias("__od"),
            (
                F.col("__ra").cast("double")
                * F.col("__cb").cast("double")
                / F.col("__n").cast("double")
            ).alias("__e"),
            "__n",
            "r",
            "c",
        )
    )
    term = F.floor(
        (F.col("__od") - F.col("__e"))
        * (F.col("__od") - F.col("__e"))
        / F.col("__e")
        * 1_000_000
    ).cast("bigint")
    out = joined.groupBy("__n", "r", "c").agg(
        F.sum(term).cast("bigint").alias("chi2_micro")
    )
    chi2 = F.col("chi2_micro").cast("double") / 1e6
    mind = F.least(F.col("r") - 1, F.col("c") - 1)
    return out.select(
        F.col("__n").alias("n"),
        "r",
        "c",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("int").alias("dof"),
        "chi2_micro",
        chi2.alias("chi2"),
        F.when(
            mind > 0,
            F.sqrt(chi2 / (F.col("__n").cast("double") * mind)),
        ).alias("cramers_v"),
    )


def permutation_test_by_group(
    df: DataFrame,
    group_cols: list[str],
    arm_col: str,
    metric_cents_col: str,
    n_perm: int = 63,
    seed: str = "perm0",
) -> DataFrame:
    """Per-group randomization test of association between a boolean
    arm and an integer-cents metric — EXACT-inference companion to
    :func:`welch_t_by_group`: no normality assumption, no CDF, and
    (unlike t→p) the p-value is ENGINE-PORTABLE because the
    randomness is md5-derived, so any SQL engine replays the same
    ``n_perm`` reassignments bit-for-bit.

    Statistic (sums in bigint — linear in cents, wrapping needs
    Σ|cents| ≈ 9.2e18 per group; cross-products in decimal(38,0) —
    n·Σx exceeds int64 around a few MILLION rows per group of
    ~$150k-order cents, and the DuckDB oracle uses HUGEINT):
    ``T = |n·Σ(x·a) − (Σa)·Σx|`` — n² times
    the absolute sample covariance between assignment and metric, so
    it is comparable across reassignments with varying arm sizes.
    Null replicates draw ``a ~ Bernoulli(1/2)`` per row from
    ``md5(seed|perm|row-key)`` (a Monte-Carlo randomization test —
    fixed-margin permutations are not expressible as a per-row hash,
    and the Bernoulli null is itself a valid randomization
    distribution for the no-association hypothesis). One-sided
    Monte-Carlo p with the +1 correction:
    ``p = (1 + #{T_perm ≥ T_obs}) / (n_perm + 1)``, emitted in exact
    micro-units (``p_micro = floor(1e6·…)``).

    Scale shape: the corpus is exploded ``n_perm``× (the honest cost
    of exact inference — bounded, user-chosen) into ONE map-side-
    combinable aggregate keyed (group, perm); everything after runs
    on the (groups × n_perm) frame. Row identity for the hash is the
    md5 of the row's own content plus an intra-duplicate rank —
    content-derived, so the draw is partitioning-independent, and
    rank-disambiguated so identical rows draw independent bits
    (which copy takes which rank is immaterial: the copies are
    exchangeable, the multiset of keys is deterministic).

    Output per group: ``(group_cols..., n bigint, t_obs bigint,
    n_ge bigint, p_micro bigint)``.
    """
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    if n_perm < 1:
        raise ValueError("n_perm must be >= 1")
    x = F.col(metric_cents_col).cast("bigint")
    a = F.col(arm_col).cast("boolean")
    base = df.where(a.isNotNull() & x.isNotNull()).select(
        *group_cols,
        a.cast("int").alias("__a"),
        x.alias("__x"),
        # deterministic per-row key: hash of the row's own content
        # plus a disambiguating intra-duplicate rank (identical rows
        # must draw INDEPENDENT assignment bits, or duplicates move
        # in lockstep and shrink the effective null space)
        F.md5(
            F.concat_ws(
                "\x1f",
                *[F.col(c).cast("string") for c in group_cols],
                a.cast("string"),
                x.cast("string"),
            ).cast("binary")
        ).alias("__rk"),
    )
    # Explicit hash repartition on the dedup-window keys, sized to the
    # session parallelism floor: the window's required distribution is
    # exactly (group, __rk), so this REPLACES the planner's exchange
    # (no extra shuffle, both downstream consumers still share it) —
    # but an explicit-N exchange is exempt from AQE's byte-based
    # partition coalescing, which otherwise shrinks this small-bytes
    # frame to a handful of partitions and serializes the n_perm×
    # explode+md5 stage that reads it (row amplification inside a
    # stage is invisible to AQE's sizing; measured at sf0.1: q178's
    # explode ran as 6 tasks x 7.5 s). N = max(defaultParallelism,
    # shuffle-partition ceiling) keeps the production value: on a
    # cluster spark.sql.shuffle.partitions is the operator's normal
    # exchange width anyway, so this never narrows a large job.
    sess = df.sparkSession
    n_part = max(
        sess.sparkContext.defaultParallelism,
        int(sess.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    base = base.repartition(n_part, *group_cols, "__rk")
    wdup = Window.partitionBy(*group_cols, "__rk").orderBy(F.lit(1))
    base = base.withColumn(
        "__rk",
        F.concat_ws("#", F.col("__rk"), F.row_number().over(wdup).cast("string")),
    )
    # The T cross-multiplication runs in decimal(38,0): n·Σx ≈
    # n²·mean(cents) blows past int64 around a few million rows per
    # group of ~$150k-order cents, and with ANSI off a bigint product
    # wraps SILENTLY — the DuckDB oracle computes in HUGEINT, so
    # decimal(38,0) is the matching exact-width path (same hardening
    # as welch_t_by_group / ks_statistic). The SUMS themselves stay
    # bigint for speed (a long sum over the 63×-exploded frame is
    # several times cheaper than a decimal sum): they are LINEAR in
    # the metric, so Σ|cents| would have to reach 9.2e18 — ~$9e16,
    # thousands of times global GDP per group — before wrapping;
    # the quadratic terms are what overflow at real scale, and those
    # are the ones computed in decimal.
    dec = "decimal(38,0)"
    obs = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").cast("bigint").alias("__sx"),
        F.sum(F.col("__a").cast("bigint")).cast("bigint").alias("__na"),
        F.sum(F.col("__x") * F.col("__a")).cast("bigint").alias("__sxa"),
    ).select(
        *group_cols,
        "n",
        "__sx",
        F.abs(
            F.col("n").cast(dec) * F.col("__sxa").cast(dec)
            - F.col("__na").cast(dec) * F.col("__sx").cast(dec)
        ).alias("__t_obs_dec"),
    )
    # Explode the perm index FIRST (a constant 1..n_perm array), then
    # derive the assignment bit as a top-level projection: the md5
    # inside a transform() lambda runs on the INTERPRETED expression
    # path (measured on q178: 73 CPU-seconds for 9.4M hashes), while
    # the identical expression as a plain projection after the explode
    # is whole-stage-codegen'd. Same concat bytes -> same md5 -> same
    # bit; the explode itself multiplies only (group, __x, __rk) rows
    # inside one codegen stage, nothing extra crosses a shuffle.
    perms = base.select(
        *group_cols,
        "__x",
        "__rk",
        F.explode(F.sequence(F.lit(1), F.lit(n_perm))).alias("__perm"),
    ).select(
        *group_cols,
        "__x",
        "__perm",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "\x1f",
                            F.lit(seed),
                            F.col("__perm").cast("string"),
                            F.col("__rk"),
                        ).cast("binary")
                    ),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("int")
            % 2
        ).alias("__bit"),
    )
    null_stats = perms.groupBy(*group_cols, "__perm").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__x").cast("bigint").alias("__sx"),
        F.sum(F.col("__bit").cast("bigint")).cast("bigint").alias("__nb"),
        F.sum(F.col("__x") * F.col("__bit")).cast("bigint").alias("__sxb"),
    ).select(
        *group_cols,
        F.abs(
            F.col("__n").cast(dec) * F.col("__sxb").cast(dec)
            - F.col("__nb").cast(dec) * F.col("__sx").cast(dec)
        ).alias("__t_perm"),
    )
    cmp = null_stats.join(F.broadcast(obs), group_cols).groupBy(
        *group_cols, "n", "__t_obs_dec"
    ).agg(
        # both sides decimal(38,0): the >= comparison is exact
        F.sum((F.col("__t_perm") >= F.col("__t_obs_dec")).cast("int"))
        .cast("bigint")
        .alias("n_ge")
    )
    # t_obs is contractually bigint (the oracle emits CAST(... AS
    # BIGINT)); a decimal→bigint overflow would NULL silently with
    # ANSI off, so fail loud instead — "exact or error".
    i64max = F.lit("9223372036854775807").cast(dec)
    t_obs_out = F.when(
        F.col("__t_obs_dec") <= i64max,
        F.col("__t_obs_dec").cast("bigint"),
    ).otherwise(
        F.raise_error(
            F.lit("permutation_test_by_group: t_obs exceeds int64")
        ).cast("bigint")
    )
    return cmp.select(
        *group_cols,
        "n",
        t_obs_out.alias("t_obs"),
        "n_ge",
        F.floor(
            (F.lit(1) + F.col("n_ge")) * F.lit(1_000_000) / F.lit(n_perm + 1)
        )
        .cast("bigint")
        .alias("p_micro"),
    )
