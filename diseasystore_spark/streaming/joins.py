"""Stream-stream event-time joins (Structured Streaming's
interval-join pattern, public API).

The reference has no streaming; this extends the event-analytics
tier (funnels, sessionization) with the canonical two-stream shape:
attribute each conversion to the impressions that PRECEDED it within
an attribution window, where both sides arrive as unbounded streams.

Spark executes this as a watermarked symmetric hash join: each side
buffers only rows younger than its watermark plus the join range, so
state is bounded by (event rate × window), never by stream length —
the property that makes the operator runnable forever. The SAME
function works on batch DataFrames (``withWatermark`` is a no-op on
batch plans), which is what the stream==batch test leans on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attribute_conversions", "contact_events"]


def attribute_conversions(
    impressions: DataFrame,
    conversions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Every (impression, conversion) pair for the same user where the
    conversion lands in ``(imp_ts, imp_ts + window_seconds]`` — the
    standard last/any-touch attribution candidate set (pick a policy
    downstream: ``row_number`` by recency for last-touch).

    Output: ``(user_id, imp_ts, conv_ts, lag_us bigint)`` — microsecond
    lag; NULL event
    times are dropped on both sides (they cannot be ordered).

    Streaming contract: both inputs get a ``watermark`` on their event
    time; the join condition is an equi-key (user) plus a bounded time
    range, which Structured Streaming requires to know when buffered
    state can be evicted. ``watermark`` must be >= the out-of-order
    bound of BOTH streams; rows later than that are dropped by the
    engine (standard late-data semantics). Works identically on batch
    frames (the oracle/q94 path).
    """
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    imp = (
        impressions.where(F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("imp_ts"),
        )
        .withWatermark("imp_ts", watermark)
    )
    conv = (
        conversions.where(F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("__c_user"),
            F.col(ts_col).alias("conv_ts"),
        )
        .withWatermark("conv_ts", watermark)
    )
    joined = imp.join(
        conv,
        (F.col("user_id") == F.col("__c_user"))
        & (F.col("conv_ts") > F.col("imp_ts"))
        & (
            F.col("conv_ts")
            <= F.col("imp_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS")
        ),
    )
    return joined.select(
        "user_id",
        "imp_ts",
        "conv_ts",
        (F.unix_micros("conv_ts") - F.unix_micros("imp_ts"))
        .cast("bigint")
        .alias("lag_us"),
    )


def contact_events(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    tolerance_s: int = 3600,
    watermark: str = "2 hours",
    event_sample_rate: float | None = None,
    sample_seed: str = "cp0",
) -> DataFrame:
    """Streaming twin of ``operators/events.contact_pairs``'s pair
    stage: emit every unordered cross-user EVENT pair within
    ``tolerance_s`` seconds, exactly once, from an unbounded event
    stream (count per user pair downstream).

    A stream-stream self-join needs an EQUALITY key for the symmetric
    hash join to bound its state; "any two events close in time" has
    none — so the batch operator's time-bucket trick supplies it: the
    left side explodes each event to its own and the next
    ``tolerance``-wide bucket, the right side keys by its bucket, and
    the join is bucket-equality plus the exact time range. Each side
    then buffers only (rate x watermark+tolerance) rows.

    Output: ``(user_a, user_b, ts_a, ts_b, lag_us bigint)`` — the
    pair is ordered by (ts, id), NOT by user id, so user_a is the
    earlier event's user; normalize with least/greatest downstream
    when unordered user pairs are wanted (as ``contact_pairs`` does).
    Works identically on batch frames (watermark is a no-op), which
    the stream==batch test leans on.

    ``event_sample_rate=q``: the batch operator's candidate bound,
    applied identically here — the deterministic md5 threshold on the
    event id (same seed domain, same hash, NULL-id events dropped)
    thins the stream BEFORE both join sides, so per-side stream state
    (rate × watermark+tolerance rows) shrinks by q and the join
    fan-in by q². Stateless, so it composes with the watermark and
    keeps stream == thinned-batch exact.
    """
    if tolerance_s <= 0:
        raise ValueError("tolerance_s must be positive")
    if event_sample_rate is not None and not (
        0.0 < event_sample_rate <= 1.0
    ):
        raise ValueError("event_sample_rate must be in (0, 1]")
    tol_us = tolerance_s * 1_000_000
    base = events.where(F.col(ts_col).isNotNull())
    if event_sample_rate is not None and event_sample_rate < 1.0:
        from diseasystore_spark.operators.events import _u32_hash

        base = base.where(
            _u32_hash(
                F.lit(sample_seed),
                F.lit("ev"),
                F.col(id_col).cast("string"),
            )
            < F.lit(int(round(event_sample_rate * 2**32)))
        )
    left = (
        base.withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).alias("ua"),
            F.col(id_col).alias("ia"),
            F.col(ts_col).alias("ts_a"),
            F.explode(
                F.array(
                    F.expr(f"unix_micros({ts_col}) DIV {tol_us}"),
                    F.expr(f"unix_micros({ts_col}) DIV {tol_us} + 1"),
                )
            ).alias("__b"),
        )
    )
    right = base.withWatermark(ts_col, watermark).select(
        F.col(user_col).alias("ub"),
        F.col(id_col).alias("ib"),
        F.col(ts_col).alias("ts_b"),
        F.expr(f"unix_micros({ts_col}) DIV {tol_us}").alias("__rb"),
    )
    j = left.join(
        right,
        (F.col("__b") == F.col("__rb"))
        & (F.col("ts_b") >= F.col("ts_a"))
        & (
            F.unix_micros("ts_b") - F.unix_micros("ts_a")
            <= F.lit(tol_us)
        )
        & (
            (F.col("ts_a") < F.col("ts_b"))
            | (F.col("ia") < F.col("ib"))
        )
        & (F.col("ua") != F.col("ub")),
    )
    return j.select(
        F.col("ua").alias("user_a"),
        F.col("ub").alias("user_b"),
        "ts_a",
        "ts_b",
        (F.unix_micros("ts_b") - F.unix_micros("ts_a"))
        .cast("bigint")
        .alias("lag_us"),
    )
