"""Funnel conversion and cohort-retention analytics over event streams.

The engine's event operators so far answer "how often / with whom"
(transition matrices q154, contact graphs q124/q155/q156, sessions);
these two answer the product-analytics staples a store of user events
exists to serve:

- :func:`funnel_steps` / :func:`funnel_conversions` — ordered-step
  funnel: of the users who did step 1, how many went on to do step 2
  *after* it, then step 3 after that, ... (the Amplitude/Mixpanel
  core query).
- :func:`cohort_retention` — weekly cohort retention: users grouped
  by the week of their first event; for each cohort x week-offset,
  how many came back.

Both are engine-exact (timestamps compared, counts counted, rates as
floored micro-unit integers) so a DuckDB oracle replays them
bit-for-bit.

Funnel semantics (the deterministic, SQL-replayable convention):
``t_1`` = the user's EARLIEST step-1 event; ``t_{i+1}`` = the earliest
step-(i+1) event STRICTLY after ``t_i``; with ``within_seconds`` set,
all later steps must also land within that horizon of ``t_1`` (the
window is anchored at the earliest step-1 event — we do not search
alternative anchors, which keeps the query one pass per step instead
of a per-anchor scan).

Scale shape: the event table is filtered to the k step types ONCE
(filter + a small CASE pushed to the scan), then each step is one
equi-join on the user key against the (small, one-row-per-user)
frontier frame followed by a combinable ``min`` aggregate — k-1
shuffles of per-user rows, never a per-user ``collect_list`` (no
whale-user memory cliff), never a window. The final conversion table
is computed inside ONE aggregated row (all k counts side by side, so
step-over-step rates need no lag window) and exploded to k rows with
``stack``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user earliest completion timestamps for an ordered funnel.

    Output: one row per user that completed step 1, with columns
    ``user_col, t_1, ..., t_k`` (``t_i`` NULL where the funnel
    stalled before step i). Steps must be distinct event-type
    literals; a user's ``t_{i+1}`` is their earliest ``steps[i+1]``
    event strictly after ``t_i`` (and, when ``within_seconds`` is
    set, at most that many seconds after ``t_1``).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")

    ev = df.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__t"),
    ).where(F.col("__t").isin(list(steps)) & F.col("__ts").isNotNull())

    # Frontier frame: one row per user who entered the funnel.
    cur = (
        ev.where(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("t_1"))
    )
    for i in range(1, len(steps)):
        step_ev = ev.where(F.col("__t") == steps[i]).select(
            F.col("__u").alias("__eu"), "__ts"
        )
        cond = (F.col("__eu") == F.col("__u")) & (
            F.col("__ts") > F.col(f"t_{i}")
        )
        if within_seconds is not None:
            # Interval arithmetic (not epoch-seconds casts): exact on
            # sub-second timestamps and replayed identically by any
            # SQL engine's TIMESTAMP + INTERVAL.
            cond = cond & (
                F.col("__ts")
                <= F.col("t_1")
                + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
            )
        nxt = (
            cur.join(step_ev, cond, "left")
            .groupBy("__u", *[f"t_{j}" for j in range(1, i + 1)])
            .agg(F.min("__ts").alias(f"t_{i + 1}"))
        )
        cur = nxt
    return cur.withColumnRenamed("__u", user_col)


def funnel_conversions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Step-level funnel rollup: users reaching each step plus
    floored micro-unit conversion rates.

    Output (k rows, one per step): ``step`` (1-based), ``step_name``,
    ``n_users``, ``conv_from_first_micro`` (``n_i * 1e6 div n_1``),
    ``conv_from_prev_micro`` (``n_i * 1e6 div n_{i-1}``; 1e6 for
    step 1). Integer floor division on positive counts — identical in
    any engine.
    """
    per_user = funnel_steps(
        df, user_col, ts_col, type_col, steps, within_seconds
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"t_{i + 1}")).cast("bigint").alias(f"n_{i + 1}")
            for i in range(len(steps))
        ]
    )
    # All k counts sit in one row: conversion rates are plain
    # expressions, no lag window over an unpartitioned frame.
    exprs = []
    for i in range(len(steps)):
        n_i = f"n_{i + 1}"
        # Integer `div` on positive bigints — floor division with no
        # float in the path, identical in any engine.
        first = F.when(
            F.col("n_1") > 0,
            F.expr(f"({n_i} * {MICRO}L) div n_1"),
        ).otherwise(F.lit(0))
        if i == 0:
            prev = F.when(F.col("n_1") > 0, F.lit(MICRO)).otherwise(F.lit(0))
        else:
            prev = F.when(
                F.col(f"n_{i}") > 0,
                F.expr(f"({n_i} * {MICRO}L) div n_{i}"),
            ).otherwise(F.lit(0))
        exprs.append(
            F.struct(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(steps[i]).alias("step_name"),
                F.col(n_i).alias("n_users"),
                first.cast("bigint").alias("conv_from_first_micro"),
                prev.cast("bigint").alias("conv_from_prev_micro"),
            )
        )
    return counts.select(
        F.explode(F.array(*exprs)).alias("__s")
    ).select("__s.*")


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    max_week_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort retention matrix.

    A user's cohort is the ISO week (Monday-truncated date) of their
    earliest event; for every (cohort_week, week_offset) cell the
    output counts the cohort's users active in that calendar week.
    ``retained_micro`` = ``n_active * 1e6 div cohort_size`` (floored
    micro-units; offset 0 is 1e6 by construction). Offsets beyond
    ``max_week_offset`` (when set) are dropped.

    Scale shape: one distinct over (user, week) — the only row-scale
    shuffle; the per-user min is a combinable aggregate over that
    same reduced frame; cohort sizes are a cohort-week-cardinality
    frame (weeks, not users) joined broadcast. No windows.
    """
    uw = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("__w"),
        )
        .distinct()
    )
    first = uw.groupBy("__u").agg(F.min("__w").alias("cohort_week"))
    cells = (
        uw.join(first, "__u")
        .select(
            "cohort_week",
            (F.datediff(F.col("__w"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
            "__u",
        )
    )
    if max_week_offset is not None:
        cells = cells.where(F.col("week_offset") <= int(max_week_offset))
    active = cells.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("__u").cast("bigint").alias("n_active")
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        active.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.expr(f"(n_active * {MICRO}L) div cohort_size")
            .cast("bigint")
            .alias("retained_micro"),
        )
    )
