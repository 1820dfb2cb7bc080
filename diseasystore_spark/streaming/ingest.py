"""Structured Streaming ingest into the SCD2 feature store.

The reference has **no** streaming — its incrementality is batch
memoization over validity-date ranges (SURVEY.md §2.9). This module is
the natural Spark extension the survey anticipates: a stream of
feature rows written through the same SCD2 merge, so snapshot
semantics (``slice_ts``) stay identical for batch and streaming
producers.

Design:

- ``stream_feature_updates`` runs a ``foreachBatch`` sink: each
  micro-batch is SCD2-merged at a per-batch ``slice_ts`` (event-time
  high-water mark or wall clock), giving exactly-once semantics per
  batch against the versioned store (the version pointer swap is
  atomic; a replayed batch re-merges idempotently because checksums
  match).
- ``windowed_event_counts`` is the standard watermark + tumbling
  window aggregation shape over the ``events`` table, usable with
  ``availableNow`` triggers for backfill-style runs.
"""

from __future__ import annotations

import datetime
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from diseasystore_spark.storage.scd2 import ParquetFeatureStore


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 day",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window event counts with late-data watermarking.
    Works on both batch and streaming DataFrames (same plan)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(type_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").cast("date").alias("valid_from"),
            F.col("window.end").cast("date").alias("valid_until"),
            F.col(type_col).alias("key_event_type"),
            F.col("n_events").cast("double").alias("n_events"),
        )
        .select("key_event_type", "n_events", "valid_from", "valid_until")
    )


def windowed_distinct_users(
    events: DataFrame,
    window_duration: str = "1 day",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
    rsd: float = 0.02,
) -> DataFrame:
    """Distinct active users per tumbling window via HyperLogLog++
    (``approx_count_distinct``) — the streaming-legal form of the
    metric: exact distinct needs the full value set per window in
    state, the sketch needs O(1/rsd^2) bytes regardless of traffic.
    Works on both batch and streaming frames (same plan); on a stream
    the watermark bounds state and finalizes windows. ``rsd`` is the
    target relative standard deviation (2% default).

    Output: (window_start, window_end, approx_users). For the exact
    batch twin, replace the aggregate with ``count_distinct`` — the
    test pins the sketch's error envelope against it.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration))
        .agg(
            F.approx_count_distinct(F.col(user_col), rsd).alias(
                "approx_users"
            )
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col("approx_users").cast("bigint").alias("approx_users"),
        )
    )


def stream_feature_updates(
    stream_df: DataFrame,
    backend: ParquetFeatureStore,
    table_id: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    slice_ts_fn: Callable[[int, DataFrame], datetime.datetime] | None = None,
    event_ts_col: str | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    mode: str = "append",
) -> StreamingQuery:
    """Write a stream of feature rows through the SCD2 store.

    Each micro-batch is transformed (optional) and merged with
    ``update_snapshot`` at a per-batch ``slice_ts``. With
    ``available_now=True`` the query drains all available input and
    stops — the batch-backfill pattern.

    ``mode="append"`` (default) merges insert-only: each batch's rows
    open at the batch ``slice_ts``, nothing closes. Streaming
    emissions are *increments* — closed sessions, watermark-finalized
    windows — so a row's absence from a later batch carries no
    information; a snapshot compare would wrongly close every earlier
    batch's rows. ``mode="snapshot"`` restores the full compare for
    producers whose every batch is a complete state (e.g. a periodic
    full recompute pushed through the stream).

    ``slice_ts`` per batch, in precedence order:

    - ``slice_ts_fn(epoch_id, batch_df)`` — arbitrary hook;
    - ``event_ts_col`` — the batch's **event-time high-water mark**
      (``max`` of that column, pre-``transform``): the transaction
      timeline follows the data, so a replayed or re-partitioned run
      produces identical snapshots, and ``get_table(slice_ts=τ)``
      answers "the store as of event time τ". The column is read
      before ``transform`` so aggregations need not carry it through.
      Note: batch maxima need not be monotone under late data — the
      SCD2 merge accepts out-of-order writes (no chronological-order
      enforcement, matching the reference's
      ``enforce_chronological_order = FALSE`` call-site contract);
      a batch whose events are all late merges at an earlier slice.
    - otherwise a deterministic epoch-derived timestamp (fixed origin
      + epoch seconds; wall-clock would break replay determinism).
    """

    if mode not in ("append", "snapshot"):
        raise ValueError(f"mode must be 'append' or 'snapshot', got {mode!r}")

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        hwm = None
        if event_ts_col is not None and slice_ts_fn is None:
            hwm = batch_df.agg(F.max(event_ts_col)).first()[0]
        if transform is not None:
            batch_df = transform(batch_df)
        if batch_df.isEmpty():
            return
        if slice_ts_fn is not None:
            ts = slice_ts_fn(epoch_id, batch_df)
        elif hwm is not None:
            if isinstance(hwm, datetime.date) and not isinstance(
                hwm, datetime.datetime
            ):
                hwm = datetime.datetime.combine(hwm, datetime.time())
            ts = hwm
        else:
            # Deterministic per-batch slice: epoch offset from a fixed
            # origin (wall-clock would break replay determinism).
            ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
                seconds=epoch_id
            )
        backend.update_snapshot(
            batch_df, table_id, ts, close_absent=(mode == "snapshot")
        )
        backend.append_log(
            table_id.partition(".")[0],
            table_id,
            ts,
            f"stream-batch: {epoch_id}",
            success=True,
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user session aggregates via Spark's NATIVE
    ``session_window`` — the built-in complement to the custom
    ``sessionize_stream`` operator: when all you need per session is
    (start, end, count), the JVM-side session-window aggregation does
    it with zero Python state (use ``sessionize_stream`` only for
    custom payloads/emission the built-in cannot express).

    Output: ``(user_id, session_start, session_end, n_events)`` where
    ``session_end`` is the LAST EVENT's timestamp (``max(ts)``), not
    the window's gap-extended close — matching the batch q33
    formulation, where a session closes when the next event is more
    than ``gap`` away (an event exactly ``gap`` later still extends
    the session).

    Works on both batch and streaming frames (same plan); on a stream
    the watermark finalizes windows and bounds state. Scale: state is
    one (user, open-window) aggregate — counts, not event buffers.

    Late-row policy (pinned by ``test_session_counts_late_data_policy``):
    a session is finalized — emitted exactly once, state evicted —
    when the watermark passes its gap-extended close. A straggler
    arriving while the session is still in state merges (possibly
    bridging two sessions into one); a straggler behind the watermark
    arriving after eviction is DROPPED — it neither reopens the
    finalized session nor opens a phantom one. Size ``watermark`` to
    the feed's real out-of-orderness.
    """
    return (
        events.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            "session_end",
            "n_events",
        )
    )


def windowed_distinct_hll(
    events: DataFrame,
    window_duration: str = "1 day",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "user_id",
    m: int = 256,
) -> DataFrame:
    """Distinct cardinality per tumbling window as PORTABLE HLL
    register frames (``pipeline/sketch`` md5 family) — the
    persistable/mergeable sibling of ``windowed_distinct_users``
    (whose DataSketches state never leaves the JVM): emitted rows are
    ``(window_start, window_end, reg, rank, m)``, estimable with
    ``hll_estimate`` and re-aggregable with ``hll_merge`` (day
    windows roll up to weeks by register ``max`` — no re-reading the
    stream).

    Works on both batch and streaming frames (same plan); streaming
    state is at most ``m`` register maxima per open window, finalized
    by the watermark. The per-row hash/rank is the exact
    ``hll_build`` expression, so batch and stream emit identical
    registers and any SQL engine can replay them.
    """
    from diseasystore_spark.pipeline.sketch import _hll_p

    p = _hll_p(m)
    rmax = 61 - p
    h = (
        f"cast(conv(substr(md5(cast({value_col} as string)), 1, 15), "
        f"16, 10) as bigint)"
    )
    hashed = events.where(F.col(value_col).isNotNull()).select(
        F.col(ts_col),
        F.expr(f"pmod({h}, {m})").cast("int").alias("reg"),
        F.expr(
            f"CASE WHEN {h} DIV {m} = 0 THEN {rmax} "
            f"ELSE {rmax} - length(bin({h} DIV {m})) END"
        ).cast("int").alias("rank"),
    )
    return (
        hashed.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("reg"))
        .agg(F.max("rank").cast("int").alias("rank"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "reg",
            "rank",
            F.lit(m).alias("m"),
        )
    )
