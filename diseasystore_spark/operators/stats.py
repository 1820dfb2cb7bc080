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

from pyspark.sql import DataFrame
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
