"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no streaming (SURVEY §2.9); batch sessionization is
query q33. This module gives the same semantics over an unbounded
stream: per-user session windows with a gap timeout, carried across
micro-batches in group state — the operator shape Spark's built-in
``session_window`` aggregation cannot express once you need custom
per-session payloads or emission policy.

State design: one open session per user — ``(session_start, last_ts,
n_events)`` stored as int64 epoch-micros (Arrow-stable, no tz
ambiguity). Per batch and user, events are sorted by event time,
folded onto the open session, and every gap > ``gap_seconds`` closes
a session (emitted downstream) and opens the next. The still-open
session goes back into state with an **event-time timeout** at
``last_ts + gap``: when the watermark passes it, the session provably
cannot extend (later events would be dropped as late), so the timeout
branch emits it and clears state. Exactly the semantics of the batch
formulation, incrementalized.

Late data: events older than the watermark are dropped by Spark
before the function runs; within-batch disorder is handled by the
sort. Scale: state is O(users), each group call touches one user's
batch slice; shuffle key = user_id (the same partitioning the batch
window uses).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from diseasystore_spark.operators.events import NOT_REACHED
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),  # epoch micros
        StructField("last_ts", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _emit(user: int, start_us: int, end_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session windows per user (gap > ``gap_seconds`` closes
    a session). Works on a streaming DataFrame; emits one row per
    *closed* session — a session closes when a later event proves the
    gap, or when the event-time watermark passes its timeout.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit(user, start_us, last_us, n)
            return

        # normalize through datetime64[us] so the epoch math is unit-
        # safe whichever resolution (ns/us) Arrow hands pandas
        ts_us = (
            pd.concat([pdf[ts_col] for pdf in pdf_iter])
            .sort_values()
            .to_numpy()
            .astype("datetime64[us]")
            .astype("int64")
        )
        if len(ts_us) == 0:
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = int(ts_us[0]), int(ts_us[0]), 0

        for t in ts_us:
            t = int(t)
            if n > 0 and t - last_us > gap_us:
                yield _emit(user, start_us, last_us, n)
                start_us, n = t, 0
            last_us = max(last_us, t)
            n += 1

        state.update((start_us, last_us, n))
        # Event-time timeout: fires when the watermark passes the
        # instant after which no on-time event can extend the session.
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def funnel_stream(
    events: DataFrame,
    stages: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    watermark: str = "1 hour",
    within_seconds: int | None = None,
) -> DataFrame:
    """Streaming funnel progression (the incremental form of
    ``operators.events.funnel_reach``): per user, maintain the exact
    reach times ``tj = min ts of stage j strictly after t(j-1)``
    across micro-batches, emitting ``(user_id, reach)`` whenever a
    batch CHANGES the user's reach vector. The LAST emission per user
    equals the batch operator over the full history — exactly, even
    with out-of-order arrival (any disorder within the watermark).

    Exactness under late data rests on two monotonicity facts:

    - every ``tj`` is non-increasing as events arrive (new events only
      add candidates, and a lower ``t(j-1)`` only widens stage j's
      candidate set), so
    - a stage-j event time strictly greater than the CURRENT ``tj``
      can never become the answer — it is safe to discard.

    State per user is therefore one sorted time array per stage,
    pruned to times <= the stage's current reach (everything, while
    the stage is unreached). A completed funnel's state collapses
    toward K near-singleton arrays; the adversarial worst case (a
    stage never reached, its candidates unprunable) grows with that
    user's event count for that stage — same order as any exact
    late-data-correct formulation. Recompute per (user, batch) is a
    merge + one K-stage scan over the kept arrays.

    ``within_seconds`` is the batch twin's conversion window (stages
    past the first must land within that many seconds of ``t0``, the
    user's earliest first-stage event). The monotonicity argument
    extends: ``t0`` is non-increasing, so the window end ``t0 + W``
    is non-increasing too — a candidate beyond the CURRENT window can
    never re-enter it and is safely discarded (a bonus prune for
    otherwise-unreached stages), and a late earlier first-stage event
    may REGRESS a later stage to NULL by pulling the window back —
    exactly what the batch operator computes over the full history.

    Requires distinct ``stages`` (same contract as the batch
    operator). State carries epoch MICROS (int64, Arrow-stable).
    """
    if not stages:
        raise ValueError("stages must be a non-empty ordered list")
    if len(set(stages)) != len(stages):
        raise ValueError("stages must be distinct event types")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError(
            "within_seconds must be positive (pass None for no window)"
        )
    win_us = (
        None if within_seconds is None else int(within_seconds) * 1_000_000
    )
    k = len(stages)
    stage_idx = {s: j for j, s in enumerate(stages)}

    from pyspark.sql import functions as F  # local: keep module header lean
    from pyspark.sql.types import ArrayType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("reach", ArrayType(LongType())),
        ]
    )
    state_schema = StructType(
        [StructField(f"cand_{j}", ArrayType(LongType())) for j in range(k)]
        + [StructField("reach", ArrayType(LongType()))]
    )

    def _recompute(cands: list[list[int]]) -> list[int | None]:
        reach: list[int | None] = []
        prev: int | None = None
        hi: int | None = None  # window end t0 + W (None = no window)
        for j in range(k):
            cur = None
            for t in cands[j]:  # sorted ascending: first hit is the min
                if j == 0:
                    cur = t
                    break
                if (
                    prev is not None
                    and t > prev
                    and (hi is None or t <= hi)
                ):
                    cur = t
                    break
            if j == 0 and cur is not None and win_us is not None:
                hi = cur + win_us
            reach.append(cur)
            prev = cur
        return reach

    def fn(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        # Per-group work is the micro-batch's bill (thousands of tiny
        # groups per task), so stay allocation-lean: no pd.concat for
        # the common single-chunk group, and re-sort only the stage
        # arrays this batch actually touched (stored arrays are
        # already sorted+deduped by the previous update).
        ts_parts: list = []
        ty_parts: list = []
        for pdf in pdf_iter:
            ts_parts.append(
                pdf[ts_col]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64")
            )
            ty_parts.append(pdf[type_col].to_numpy())
        if not ts_parts:
            return

        if state.exists:
            stored = state.get
            cands = [list(stored[j] or []) for j in range(k)]
            old_reach = list(stored[k] or [])
        else:
            cands = [[] for _ in range(k)]
            old_reach = [NOT_REACHED] * k

        touched = [False] * k
        for ts_us, types in zip(ts_parts, ty_parts):
            for t, typ in zip(ts_us, types):
                j = stage_idx.get(typ)
                if j is not None:
                    cands[j].append(int(t))
                    touched[j] = True
        for j in range(k):
            if touched[j]:
                cands[j] = sorted(set(cands[j]))

        reach = _recompute(cands)
        # Prune: times strictly above a reached stage's answer can
        # never matter again (reach is non-increasing). With a
        # conversion window, times beyond the CURRENT window end can
        # never re-enter it either (t0 + W is non-increasing) — this
        # also bounds the state of stages the window keeps unreached.
        for j in range(k):
            if reach[j] is not None:
                cands[j] = [t for t in cands[j] if t <= reach[j]]
            elif j > 0 and win_us is not None and reach[0] is not None:
                hi = reach[0] + win_us
                cands[j] = [t for t in cands[j] if t <= hi]

        enc = [NOT_REACHED if t is None else t for t in reach]
        state.update(tuple(cands) + (enc,))
        if enc != list(old_reach):
            yield pd.DataFrame(
                {"user_id": [user], "reach": [
                    [None if t == NOT_REACHED else t for t in enc]
                ]}
            )

    return (
        events.withWatermark(ts_col, watermark)
        # NULL event times are dropped here exactly as the batch twin
        # funnel_reach does (ts.isNotNull()) — a NaT would otherwise
        # become int64 min in ts_us and pollute the reach state,
        # breaking the stream==batch contract.
        .where(
            F.col(type_col).isin(list(stages))
            & F.col(ts_col).isNotNull()
        )
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
