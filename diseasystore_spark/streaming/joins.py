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

__all__ = ["attribute_conversions"]


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
