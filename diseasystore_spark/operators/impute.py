"""Time-series imputation and robust outlier flagging.

The engine's prevalence outputs are dense daily series
(``operators/delta_count``); real FEEDS are not — surveillance
sources skip days, corrupt ingests drop slices. These operators sit
between a gappy feed and the dense-spine consumers:

- :func:`locf_fill` — dense per-key calendar spine + last-observation-
  carried-forward, the standard epi/metrics gap policy (the reference
  consumes complete daily series; LOCF is how a gappy source becomes
  one without inventing trend).
- :func:`mad_outliers` — median-absolute-deviation flagging, the
  robust sibling of ``anomaly_days``'s z-test: immune to the very
  outliers it hunts (mean/std move with the corruption; medians
  don't). Used to quarantine corrupted slices before they enter a
  store.

Both are engine-exact: LOCF is deterministic by construction; MAD
uses the LOWER-median convention (the sorted element at index
``floor((n-1)/2)``, ties broken by value order) instead of the
interpolated median — interpolation is a float average whose
cross-engine reproducibility we'd rather not owe anyone, while an
order statistic is an integer-indexed row any engine selects
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from diseasystore_spark.operators._util import null_safe_on as _null_safe_on


def locf_fill(
    df: DataFrame,
    key_cols: list[str],
    date_col: str,
    value_col: str,
) -> DataFrame:
    """Dense daily spine per key + last-observation-carried-forward.

    Each key's spine spans ITS OWN [min, max] observed dates (a key
    absent from the feed contributes nothing — no global-range
    fabrication); missing days take the most recent observed value;
    ``imputed`` marks rows whose VALUE was carried — both absent days
    and observed-but-NULL days (the emitted number was not measured
    that day either way). Duplicate (key, date) rows are rejected
    loud (which value would carry?). A NULL key is a legitimate
    series of its own (null-safe spine join), not a dropped one.

    Scale shape: one combinable per-key min/max aggregate, a
    ``sequence()`` explode for the spine (rows = Σ per-key span days
    — calendar-bounded), one left join back on (key, date), and ONE
    per-key ordered window for the carry
    (``last(value, ignorenulls)`` over unbounded-preceding). No
    global window, no driver loop.

    Output: ``key_cols + (date_col, value_col, imputed boolean)``.
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    if "imputed" in df.columns:
        raise ValueError("column 'imputed' already exists")
    base = df.where(F.col(date_col).isNotNull()).select(
        *key_cols,
        F.col(date_col).cast("date").alias("__d"),
        F.col(value_col).alias("__v"),
    )
    spine = (
        base.groupBy(*key_cols)
        .agg(
            F.min("__d").alias("__lo"),
            F.max("__d").alias("__hi"),
            F.count(F.lit(1)).alias("__n"),
            F.count_distinct("__d").alias("__nd"),
        )
        .select(
            *key_cols,
            F.explode(
                F.sequence(
                    # duplicate guard rides the spine start: a key
                    # with duplicate (key, date) rows fails loud
                    # (which value would carry?)
                    F.when(
                        F.col("__n") == F.col("__nd"), F.col("__lo")
                    ).otherwise(
                        F.raise_error(
                            F.lit(
                                "locf_fill: duplicate (key, date)"
                                " observations — resolve upstream"
                            )
                        ).cast("date")
                    ),
                    F.col("__hi"),
                    F.expr("interval 1 day"),
                )
            ).alias("__d"),
        )
    )
    # Window over the SPINE side's columns (the join below carries
    # both sides' key columns; unqualified names would be ambiguous).
    w = (
        Window.partitionBy(*[F.col(f"s.{c}") for c in key_cols])
        .orderBy(F.col("s.__d"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Null-safe on the key columns (a NULL key is its own series —
    # plain equality would blank every one of its observed values and
    # mark them imputed); plain equality on the spine date (never
    # NULL on either side by construction).
    joined = spine.alias("s").join(
        base.alias("b"),
        _null_safe_on("s", "b", key_cols)
        & (F.col("s.__d") == F.col("b.__d")),
        "left",
    )
    return joined.select(
        *[F.col(f"s.{c}").alias(c) for c in key_cols],
        F.col("s.__d").alias(date_col),
        F.last(F.col("b.__v"), ignorenulls=True).over(w).alias(value_col),
        F.col("b.__v").isNull().alias("imputed"),
    )


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k_micro: int = 3_000_000,
) -> DataFrame:
    """Median-absolute-deviation outlier flag per group, engine-exact.

    ``median`` here is the LOWER median — the sorted element at index
    ``floor((n-1)/2)`` (0-based) — an order statistic every engine
    selects identically, unlike the interpolated median's float
    average. ``MAD = lower-median of |x − median|`` (computed on
    integer-cents inputs it stays an integer), and a row is flagged
    when ``|x − median| · 1e6 > k_micro · MAD`` — one integer
    cross-multiplication, no division, so the flag set is exactly
    reproducible (``k_micro = 3_000_000`` ≈ the classic 3·MAD rule).
    Groups where ``MAD = 0`` (over half the values identical) flag
    every row with ``|x − median| > 0`` — the conventional degenerate
    reading, documented rather than NULLed.

    Scale shape: two per-group ordered windows (rank for each median)
    + one broadcast-sized join of per-group medians back to rows;
    group frames are data-sized but partitioned — never global.

    Output: input columns + ``(group_median bigint, mad bigint,
    outlier boolean)``; NULL values pass through unflagged
    (``outlier`` NULL). A NULL group KEY is a legitimate stratum:
    its rows get their own median/MAD and flags (null-safe joins
    throughout), matching ``group_quantile_normalize``'s policy.
    """
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    for out in ("group_median", "mad", "outlier"):
        if out in df.columns:
            raise ValueError(f"column {out!r} already exists")
    x = F.col(value_col).cast("bigint")
    base = df.withColumn("__x", x)
    vals = base.where(F.col("__x").isNotNull())

    def lower_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        wr = Window.partitionBy(*group_cols).orderBy(F.col(col).asc())
        wn = Window.partitionBy(*group_cols)
        ranked = frame.select(
            *group_cols,
            F.col(col),
            F.row_number().over(wr).alias("__r"),
            F.count(F.lit(1)).over(wn).alias("__n"),
        )
        return ranked.where(
            F.col("__r") == F.floor((F.col("__n") - 1) / 2) + 1
        ).select(*group_cols, F.col(col).alias(out))

    # All three stat joins are NULL-SAFE on the group key: a NULL
    # group is a legitimate stratum (and the likeliest home of the
    # corrupted slices this operator quarantines) — plain equality
    # would hand every NULL-group row NULL stats and a NULL flag.
    med = lower_median(vals.select(*group_cols, "__x"), "__x", "group_median")
    dev = (
        vals.alias("v")
        .join(F.broadcast(med.alias("m")), _null_safe_on("v", "m", group_cols))
        .select(
            *[F.col(f"v.{c}").alias(c) for c in group_cols],
            F.abs(F.col("v.__x") - F.col("m.group_median")).alias("__ad"),
        )
    )
    mad = lower_median(dev, "__ad", "mad")
    stats = (
        med.alias("m")
        .join(mad.alias("d"), _null_safe_on("m", "d", group_cols))
        .select(
            *[F.col(f"m.{c}").alias(c) for c in group_cols],
            "group_median",
            "mad",
        )
    )
    return (
        base.alias("b")
        .join(
            F.broadcast(stats.alias("st")),
            _null_safe_on("b", "st", group_cols),
            "left",
        )
        .select(
            *[F.col(f"b.{c}") for c in base.columns if c != "__x"],
            "group_median",
            "mad",
            F.when(
                F.col("b.__x").isNotNull(),
                F.abs(F.col("b.__x") - F.col("group_median"))
                * F.lit(1_000_000)
                > F.lit(int(k_micro)) * F.col("mad"),
            ).alias("outlier"),
        )
    )
