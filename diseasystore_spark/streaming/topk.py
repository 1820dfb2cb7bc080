"""Streaming windowed top-k items — Misra-Gries state per event-time
window (``applyInPandasWithState``).

The batch twin is ``pipeline/sketch.mg_build`` (+ q98's exact trending
terms); here the counter summary lives in GROUP STATE keyed by the
tumbling window start, so per-window trending items (the standard
"what's hot right now" monitor) come off an unbounded stream with
bounded memory: state per window is at most ``m`` counters plus one
stream-length scalar, NOT the event count, and a window emits exactly
once — when the event-time watermark passes its end (late events
beyond the watermark are dropped by the engine, the standard
contract).

Determinism note: with ``m`` at least the window's distinct-item
count, no truncation ever fires and the emitted counts are EXACTLY
the batch per-window counts regardless of micro-batch boundaries (the
stream == batch test pins this); once truncation kicks in, arrival
order can shift which near-threshold items survive — the n/(m+1)
undercount guarantee holds, bit-identity does not. Same trade as
every mergeable-sketch pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from diseasystore_spark.pipeline.sketch import _mg_truncate

__all__ = ["stream_windowed_topk"]

TOPK_SCHEMA = StructType(
    [
        StructField("window_start", TimestampType()),
        StructField("rank", LongType()),
        StructField("item", StringType()),
        StructField("count", LongType()),
        StructField("n", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def _grouped_schema(group_col: str) -> StructType:
    return StructType(
        [StructField(group_col, StringType()), *TOPK_SCHEMA.fields]
    )


def stream_windowed_topk(
    events: DataFrame,
    item_col: str,
    window_seconds: int = 60,
    m: int = 100,
    top: int = 10,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    group_col: str | None = None,
) -> DataFrame:
    """Per-tumbling-window top-``top`` items of ``item_col`` over a
    stream: ``(window_start, rank, item, count, n)`` rows (rank by
    count desc, item asc; ``n`` = window stream length) emitted once
    per window when the watermark passes ``window_start +
    window_seconds``. NULL items/timestamps are dropped. Works
    identically on a batch frame for tests.

    ``group_col`` adds a dimension — one independent summary per
    (window, group), e.g. trending terms per language — with state
    still counter-bounded PER GROUP and exactly-once emission per
    (window, group).
    """
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    if m <= 0 or top <= 0:
        raise ValueError("m and top must be positive")
    win_us = window_seconds * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ws, grp = (key[0], None) if group_col is None else key
        ws_us = int(pd.Timestamp(ws).value // 1000)

        def emit(items, counts, n):
            ordered = sorted(
                zip(items, counts), key=lambda kv: (-kv[1], kv[0])
            )[:top]
            rows = pd.DataFrame(
                {
                    "window_start": [pd.Timestamp(ws_us, unit="us")]
                    * len(ordered),
                    "rank": pd.array(
                        range(1, len(ordered) + 1), dtype="int64"
                    ),
                    "item": pd.array(
                        [i for i, _ in ordered], dtype="string"
                    ),
                    "count": pd.array(
                        [c for _, c in ordered], dtype="int64"
                    ),
                    "n": pd.array([n] * len(ordered), dtype="int64"),
                }
            )
            if group_col is not None:
                rows.insert(0, group_col, [grp] * len(rows))
            return rows

        if state.hasTimedOut:
            items, counts, n = state.get
            state.remove()
            if len(items):
                yield emit(items, counts, n)
            return

        if state.exists:
            items, counts, n = state.get
            summary = dict(zip(items, (int(c) for c in counts)))
            n = int(n)
        else:
            summary, n = {}, 0
        for pdf in pdf_iter:
            vc = pdf[item_col].dropna().astype(str).value_counts()
            n += int(vc.sum())
            for item, c in vc.items():
                summary[item] = summary.get(item, 0) + int(c)
            _mg_truncate(summary, m)
        state.update((list(summary), [summary[i] for i in summary], n))
        # emit when the watermark proves the window complete
        state.setTimeoutTimestamp((ws_us + win_us) // 1000)

    start = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / window_seconds).cast("bigint")
        * window_seconds
    )
    events = (
        events.where(F.col(ts_col).isNotNull() & F.col(item_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .withColumn("__ws", start)
    )
    if group_col is not None:
        events = events.withColumn(group_col, F.col(group_col).cast("string"))
        grouped = events.groupBy("__ws", group_col)
        schema = _grouped_schema(group_col)
    else:
        grouped = events.groupBy("__ws")
        schema = TOPK_SCHEMA
    return grouped.applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
