"""Streaming windowed quantiles — KLL sketch state per event-time
window (``applyInPandasWithState``).

The batch twin is ``pipeline/sketch.kll_build`` + ``kll_quantiles``;
here the sketch lives in GROUP STATE keyed by the tumbling window
start, so per-window latency percentiles (the standard SLO monitor)
come off an unbounded stream with bounded memory: state per window is
the compactor's <= k * levels retained values, NOT the event count,
and a window emits exactly once — when the event-time watermark
passes its end (late events beyond the watermark are dropped by the
engine, the standard contract).

Determinism note: with ``k`` large enough that no window compacts,
the emitted quantiles are EXACTLY the batch ``quantile_cont`` of that
window's values regardless of micro-batch boundaries (the stream ==
batch test pins this); once compaction kicks in, micro-batch
arrival order can select different (equally rank-bounded) survivors —
the KLL guarantee holds, bit-identity does not. Same trade as every
mergeable-sketch pipeline.
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
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from diseasystore_spark.pipeline.sketch import _kll_compact_levels

__all__ = ["stream_windowed_quantiles"]

QUANTILE_SCHEMA = StructType(
    [
        StructField("window_start", TimestampType()),
        StructField("q", DoubleType()),
        StructField("value", DoubleType()),
        StructField("n", LongType()),
    ]
)


def _grouped_schema(group_col: str) -> StructType:
    from pyspark.sql.types import StringType

    return StructType(
        [StructField(group_col, StringType()), *QUANTILE_SCHEMA.fields]
    )

_STATE_SCHEMA = StructType(
    [
        StructField("levels", ArrayType(LongType())),
        StructField("values", ArrayType(DoubleType())),
    ]
)


def _quantile_rows(
    window_start_us: int, levels: list, values: list, qs: list[float]
) -> pd.DataFrame:
    """quantile_cont-semantics interpolation over the weighted sketch
    rows — the same math as ``kll_quantiles_grouped``."""
    import numpy as np

    lv = np.asarray(levels, dtype="int64")
    vv = np.asarray(values, dtype="float64")
    order = np.lexsort((lv, vv))
    vv, lv = vv[order], lv[order]
    w = 1 << lv
    end = np.cumsum(w)
    n = int(end[-1])
    out = []
    for q in qs:
        t = q * (n - 1)
        rlo, rhi = int(np.floor(t)), min(int(np.ceil(t)), n - 1)
        vlo = vv[np.searchsorted(end, rlo, side="right")]
        vhi = vv[np.searchsorted(end, rhi, side="right")]
        out.append(vlo + (t - rlo) * (vhi - vlo))
    return pd.DataFrame(
        {
            "window_start": [pd.Timestamp(window_start_us, unit="us")] * len(qs),
            "q": [float(q) for q in qs],
            "value": out,
            "n": [n] * len(qs),
        }
    )


def stream_windowed_quantiles(
    events: DataFrame,
    value_col: str,
    window_seconds: int = 60,
    qs: list[float] = (0.5, 0.9, 0.99),
    k: int = 200,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    group_col: str | None = None,
) -> DataFrame:
    """Per-tumbling-window quantiles of ``value_col`` over a stream:
    ``(window_start, q, value, n)`` rows emitted once per window when
    the watermark passes ``window_start + window_seconds``. NULL
    values/timestamps are dropped (they carry no rank / cannot be
    assigned a window). Works identically on a batch frame for tests.

    ``group_col`` adds a dimension: one independent sketch per
    (window, group) — per-endpoint latency percentiles, per-language
    length percentiles — output gains the group column (cast to
    string for a stable Arrow state key), state stays sketch-bounded
    PER GROUP, and every (window, group) still emits exactly once.
    """
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    qs = [float(q) for q in qs]
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    if k <= 0:
        raise ValueError("k must be positive")
    win_us = window_seconds * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ws, grp = (key[0], None) if group_col is None else key
        ws_us = int(pd.Timestamp(ws).value // 1000)

        def emit(levels_flat, values_flat):
            rows = _quantile_rows(ws_us, levels_flat, values_flat, qs)
            if group_col is not None:
                rows.insert(0, group_col, [grp] * len(rows))
            return rows

        if state.hasTimedOut:
            levels_flat, values_flat = state.get
            state.remove()
            if len(values_flat):
                yield emit(levels_flat, values_flat)
            return

        vals: list[float] = []
        for pdf in pdf_iter:
            vals.extend(
                pd.to_numeric(pdf[value_col], errors="raise")
                .dropna()
                .astype("float64")
                .tolist()
            )
        if state.exists:
            lv, vv = state.get
        else:
            lv, vv = [], []
        levels: list = [[]]
        for l_, v_ in sorted(zip(lv, vv)):
            while len(levels) <= l_:
                levels.append([])
            levels[l_].append(v_)
        # lazy fold: extend with the whole batch, compact once —
        # batch-internal order never affects which values a level can
        # hold (the compactor sorts before promoting)
        levels[0].extend(vals)
        if len(levels[0]) > k:
            _kll_compact_levels(levels, k)
        flat_l, flat_v = [], []
        for l_, buf in enumerate(levels):
            flat_l.extend([l_] * len(buf))
            flat_v.extend(buf)
        state.update((flat_l, flat_v))
        # emit when the watermark proves the window complete
        state.setTimeoutTimestamp((ws_us + win_us) // 1000)

    start = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / window_seconds).cast("bigint")
        * window_seconds
    )
    events = (
        events.where(
            F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .withWatermark(ts_col, watermark)
        .withColumn("__ws", start)
    )
    if group_col is not None:
        events = events.withColumn(group_col, F.col(group_col).cast("string"))
        grouped = events.groupBy("__ws", group_col)
        schema = _grouped_schema(group_col)
    else:
        grouped = events.groupBy("__ws")
        schema = QUANTILE_SCHEMA
    return grouped.applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def windowed_bucket_counts(
    stream: "DataFrame",
    ref: "DataFrame",
    value_col: str,
    ts_col: str = "ts",
    window_duration: str = "1 day",
    watermark: str = "1 hour",
    n_bins: int = 10,
    sketch_k: int = 32768,
    boundaries: list[float] | None = None,
) -> "DataFrame":
    """Streaming side of the drift monitor: bucket every event of a
    stream into the REFERENCE distribution's equi-probable quantile
    bins (the q143 ``distribution_drift_psi`` binning) and count per
    (tumbling window, bin) — the windowed observed-counts frame a
    drift readout (PSI, chi-square) is computed from per window.

    The reference is a BATCH frame: its KLL sketch is built once and
    the (n_bins−1)-element boundary array is embedded as a literal in
    the stream plan — so the streaming side is a map-only bucket
    projection plus ONE windowed count aggregation with bounded state
    (n_bins rows per open window), never a stream-batch join. Works
    identically on a batch frame (same plan), which is how the
    stream==batch parity test and the q166 oracle pin it.

    Output: ``(window_start timestamp, window_end timestamp, bin int,
    cur_n bigint)``; NULL values are excluded (no bin).

    Late-row policy (the watermark contract, pinned by
    ``test_windowed_bucket_counts_late_data_policy``): a window is
    finalized — emitted exactly once, state evicted — when the
    watermark passes its end. A straggler arriving while its window
    is still in state merges into the count; a straggler arriving
    after eviction is DROPPED (the finalized count never changes, and
    no window is re-emitted). Size ``watermark`` to the feed's real
    out-of-orderness: it is the completeness/latency/state-size knob.

    ``boundaries``: pass the :func:`reference_boundaries` result when
    the caller also needs the boundary array (e.g. to bucket the
    reference itself for a PSI readout) — computing it here AND there
    would cost two full sketch passes over the reference corpus for
    one identical array.
    """
    from pyspark.sql import functions as F

    if boundaries is not None:
        bounds = [float(b) for b in boundaries]
        if len(bounds) != n_bins - 1:
            raise ValueError(
                f"boundaries has {len(bounds)} entries, expected {n_bins - 1}"
            )
    else:
        bounds = reference_boundaries(ref, value_col, n_bins, sketch_k)
    binned = (
        stream.where(F.col(value_col).isNotNull())
        .withColumn("__bin", bucketize_expr(bounds, value_col))
        .withWatermark(ts_col, watermark)
    )
    return (
        binned.groupBy(
            F.window(F.col(ts_col), window_duration), F.col("__bin")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cur_n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col("__bin").alias("bin"),
            "cur_n",
        )
    )


def reference_boundaries(
    ref: "DataFrame",
    value_col: str,
    n_bins: int = 10,
    sketch_k: int = 32768,
) -> list[float]:
    """The reference distribution's interior quantile boundaries
    (``i/n_bins`` for i in 1..n_bins-1) via one KLL sketch pass —
    collected to a tiny driver-side list so consumers can embed them
    as plan literals (the streaming-legal form: no stream-batch
    join, the boundary array rides the plan). In the never-compacted
    regime (k >= n) they are bit-exact ``quantile_cont`` values."""
    from diseasystore_spark.pipeline.sketch import kll_build, kll_quantiles

    if n_bins < 2:
        raise ValueError("n_bins must be at least 2")
    sk = kll_build(ref, value_col, k=sketch_k)
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = sorted(r["value"] for r in kll_quantiles(sk, qs).collect())
    if len(bounds) != n_bins - 1:
        raise ValueError(
            f"reference produced {len(bounds)} boundaries, expected "
            f"{n_bins - 1} (empty reference?)"
        )
    return [float(b) for b in bounds]


def bucketize_expr(boundaries: list[float], value_col: str):
    """Bin-assignment column for a literal boundary array:
    ``bin = |{boundary < value}|`` (values equal to a boundary fall
    in the lower bucket — the kll_bucketize/q143 convention).
    Map-only, codegen-resident; works on batch and streaming frames
    alike."""
    from pyspark.sql import functions as F

    barr = F.array(*[F.lit(b) for b in boundaries])
    v = F.col(value_col).cast("double")
    return F.size(F.filter(barr, lambda b: b < v)).cast("int")
