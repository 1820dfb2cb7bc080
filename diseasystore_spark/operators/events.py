"""Event-sequence analytics: funnels and retention cohorts.

These are the event-stream counterparts of the interval operators —
per-user ORDERED semantics (a stage only counts if it happens after
the previous stage) expressed as single-shuffle DataFrame plans.

Scale notes (the 100 TB lens):

- ``funnel_reach`` shuffles ONCE on the user key and then runs a
  JVM-side higher-order-function state machine over each user's
  sorted event array. The alternative — one join per stage — is
  K shuffles and K scans; this is one of each regardless of K.
  Per-user event counts bound the array size; for pathological
  hot users the K-pass ``funnel_reach_joins`` variant below never
  materializes a user's history in one task (property-tested
  equivalent).
- ``retention_cohorts`` is two keyed aggregations (user -> cohort,
  then cohort x offset -> count) with the first-event frame joined
  back on the user key. Both shuffles are on natural keys; no
  window over an unpartitioned frame anywhere.

Reference parity: the diseasystore reference has no funnel/retention
operators — these belong to the large-scale pipeline extension
surface (same tier as dedup/similarity), driven by the ``events``
test table.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# "Not reached" sentinel for funnel accumulator slots. Long.MIN_VALUE
# is below unix_micros of every representable timestamp, so it can
# never collide with a real event time (the old -1 sentinel collided
# with an event at 1969-12-31T23:59:59.999999).
NOT_REACHED = -(1 << 63)


def _u32_hash(*parts: Column) -> Column:
    """Uniform uint32 (bigint) from the first 8 hex digits of md5
    over the ``\\x1f``-joined parts — the one deterministic-sampling
    hash convention of this module (pair sampling and event sampling
    share it, and the q179/q192 oracles replay it with ``||``
    concatenation). NULL-PROPAGATING by construction (``concat``,
    not ``concat_ws``): a NULL part yields a NULL hash, so every
    ``< threshold`` sampling predicate drops NULL-keyed rows exactly
    as the SQL oracles' NULL-propagating ``||`` does."""
    joined = parts[0]
    for p in parts[1:]:
        joined = F.concat(joined, F.lit("\x1f"), p)
    return F.conv(
        F.substring(F.md5(joined.cast("binary")), 1, 8), 16, 10
    ).cast("bigint")


def _stage_idx_col(type_col: str, stages: list[str]) -> Column:
    expr = F.lit(None).cast("int")
    for i in reversed(range(len(stages))):
        expr = F.when(F.col(type_col) == stages[i], F.lit(i)).otherwise(expr)
    return expr


def funnel_reach(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    extra_group_cols: list[str] | None = None,
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user funnel progression times.

    For the ordered stage list ``stages = [s0, s1, ..., sK-1]``,
    computes per user: ``t0`` = min event time of ``s0``; ``tj`` =
    min event time of ``sj`` STRICTLY AFTER ``t(j-1)``. Returns
    ``(user_col, reach)`` where ``reach`` is an ``array<bigint>`` of
    microsecond epochs, NULL at stage j if the user never reached it.

    ``within_seconds`` adds the product-analytics conversion window:
    stages past the first must land at most that many seconds after
    ``t0`` — the window is anchored at the user's EARLIEST first-stage
    event (the deterministic convention; no alternative-anchor
    search). Exact microsecond arithmetic, so a SQL oracle replays
    the boundary bit-for-bit.

    Physical plan: filter to the funnel's event types, groupBy user
    collecting ``(us, stage)`` structs, ``array_sort`` (ordered by
    ``us`` then stage index — sort order only matters for the scan;
    the strict ``us > prev`` condition makes the result independent
    of tie order), then one ``aggregate()`` pass advancing a K-slot
    accumulator. Single shuffle, zero Python.

    Equivalence to the K-CTE SQL form (``tj = min ts of sj where
    ts > t(j-1)``), by induction on j: slot 0 fills at the first s0
    event in the ascending scan, which is min(ts of s0) exactly.
    Assume slot j-1 holds the exact ``t(j-1)``. Any sj event with
    ``us > t(j-1)`` sorts strictly after the s(j-1) event that filled
    slot j-1, so by the time it is scanned the guard ``us >
    acc[j-1]`` is evaluated against the final ``t(j-1)`` — and the
    first such event in ascending order is the minimum. Strictness
    (``>``) means simultaneous events never chain within one instant
    — the conservative funnel definition. NULL event times are
    ignored (they can't participate in an ordered funnel).
    """
    if not stages:
        raise ValueError("stages must be a non-empty ordered list")
    if len(set(stages)) != len(stages):
        raise ValueError(
            "stages must be distinct event types (a repeated stage would "
            "always map to its first slot and never advance)"
        )
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError(
            "within_seconds must be positive (pass None for no window; "
            "0 would make every later stage unreachable, silently)"
        )
    k = len(stages)
    group_cols = [user_col, *(extra_group_cols or [])]
    ev = (
        events.where(
            F.col(type_col).isin(list(stages)) & F.col(ts_col).isNotNull()
        )
        .select(
            *[F.col(c) for c in group_cols],
            F.unix_micros(F.col(ts_col)).alias("__us"),
            _stage_idx_col(type_col, list(stages)).alias("__sj"),
        )
    )
    per_user = ev.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__us"), F.col("__sj")))
        ).alias("__evs")
    )
    # K-slot state machine. acc[j] is the reach time of stage j
    # (BIGINT, Long.MIN_VALUE = not reached; the sentinel keeps the
    # accumulator array non-nullable inside the lambda and is mapped
    # to NULL on output. Long.MIN_VALUE is unreachable: unix_micros
    # of any representable timestamp is > it, unlike the old -1
    # sentinel which collided with 1969-12-31T23:59:59.999999).
    # `acc[i - 1]` uses Spark SQL's 0-based [] array indexing.
    # CASE branches evaluate sequentially, so acc[i - 1] is only
    # reached when i >= 1 (ANSI mode would reject acc[-1]).
    # Conversion window: stage j >= 1 must land within `within` of
    # acc[0]. When the chain guard acc[i-1] != NOT_REACHED holds,
    # acc[0] is transitively filled and (by the induction above)
    # already final, so the bound compares against the true t0.
    win = (
        ""
        if within_seconds is None
        else f"AND e.__us <= acc[0] + {int(within_seconds) * 1_000_000} "
    )
    step = (
        "transform(acc, (v, i) -> CASE "
        f"WHEN v != {NOT_REACHED} OR i != e.__sj THEN v "
        "WHEN i = 0 THEN e.__us "
        f"WHEN acc[i - 1] != {NOT_REACHED} AND e.__us > acc[i - 1] "
        f"{win}"
        "THEN e.__us "
        "ELSE v END)"
    )
    reach = F.expr(
        "aggregate(__evs, "
        f"array_repeat(CAST({NOT_REACHED} AS BIGINT), {k}), "
        f"(acc, e) -> {step})"
    )
    return per_user.select(
        *[F.col(c) for c in group_cols],
        F.transform(
            reach,
            lambda v: F.when(v == NOT_REACHED, F.lit(None).cast("bigint"))
            .otherwise(v),
        ).alias("reach"),
    )


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel drop-off: how many users reach each stage IN ORDER.

    Output: ``(stage_idx int, stage string, users bigint)`` — one row
    per stage; ``users`` is non-increasing in ``stage_idx`` by
    construction. Thin view over :func:`funnel_conversions` (one
    shared rollup implementation): the K-row rate frame is projected
    down to the historical count schema, the two dropped rate columns
    costing nothing at K rows.
    """
    conv = funnel_conversions(events, stages, user_col, ts_col, type_col)
    return conv.select(
        (F.col("step") - 1).cast("int").alias("stage_idx"),
        F.col("step_name").alias("stage"),
        F.col("n_users").alias("users"),
    )


def funnel_conversions(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
    skew_safe: bool = False,
) -> DataFrame:
    """``funnel_counts`` plus the numbers a funnel dashboard actually
    plots: per-stage user counts AND floored micro-unit conversion
    rates, with an optional conversion window.

    Output (one row per stage): ``step`` (1-based int), ``step_name``,
    ``n_users``, ``conv_from_first_micro`` (``n_j * 1e6 div n_1``),
    ``conv_from_prev_micro`` (``n_j * 1e6 div n_(j-1)``; 1e6 at step 1
    when anyone entered). Integer ``div`` on non-negative counts —
    any engine replays the rates bit-for-bit. ``skew_safe`` routes to
    ``funnel_reach_joins`` (whale users); otherwise the single-shuffle
    state machine.

    The rollup runs inside ONE aggregated row (all K counts side by
    side), so step-over-step rates need no lag window; the row is
    then exploded to K typed structs.
    """
    reach_fn = funnel_reach_joins if skew_safe else funnel_reach
    reach = reach_fn(
        events,
        stages,
        user_col,
        ts_col,
        type_col,
        within_seconds=within_seconds,
    )
    wide = reach.agg(
        *[
            F.count(F.col("reach")[j]).cast("bigint").alias(f"__n{j}")
            for j in range(len(stages))
        ]
    )
    structs = []
    for j, s in enumerate(stages):
        n_j = f"coalesce(__n{j}, 0L)"
        first = f"CASE WHEN __n0 > 0 THEN ({n_j} * 1000000L) div __n0 ELSE 0L END"
        if j == 0:
            prev = "CASE WHEN __n0 > 0 THEN 1000000L ELSE 0L END"
        else:
            prev = (
                f"CASE WHEN __n{j - 1} > 0 THEN "
                f"({n_j} * 1000000L) div __n{j - 1} ELSE 0L END"
            )
        structs.append(
            F.struct(
                F.lit(j + 1).cast("int").alias("step"),
                F.lit(s).alias("step_name"),
                F.expr(n_j).cast("bigint").alias("n_users"),
                F.expr(first).cast("bigint").alias("conv_from_first_micro"),
                F.expr(prev).cast("bigint").alias("conv_from_prev_micro"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("__r")).select(
        "__r.*"
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int | None = None,
    with_rates: bool = False,
) -> DataFrame:
    """Classic retention triangle: users bucketed by first-activity
    period (their cohort), counted as active at each later period
    offset.

    Output: ``(cohort date, period_offset int, active_users bigint)``
    with ``period_offset = 0`` being the cohort period itself (so
    ``active_users`` at offset 0 is the cohort size).

    ``with_rates`` appends ``cohort_size`` and ``retained_micro``
    (``active_users * 1e6 div cohort_size`` — integer floor division,
    engine-portable). Sizes come from the per-user firsts frame
    (cohort-cardinality rows) joined broadcast — no window, no second
    pass over the event data.

    ``period`` is any ``date_trunc`` unit (``week`` starts Monday in
    both Spark and DuckDB/ISO). Offsets are computed by date
    difference in days divided by the period length — exact for
    ``week`` (7) and ``day`` (1); ``month`` uses months_between.
    """
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day/week/month, got {period!r}")
    events = events.where(F.col(ts_col).isNotNull())
    bucket = F.to_date(F.date_trunc(period, F.col(ts_col)))
    firsts = (
        events.select(F.col(user_col), bucket.alias("__p"))
        .groupBy(user_col)
        .agg(F.min("__p").alias("cohort"))
    )
    active = events.select(F.col(user_col), bucket.alias("__p")).distinct()
    joined = active.join(firsts, user_col)
    if period == "day":
        off = F.datediff(F.col("__p"), F.col("cohort"))
    elif period == "week":
        off = (F.datediff(F.col("__p"), F.col("cohort")) / 7).cast("int")
    else:
        off = F.months_between(F.col("__p"), F.col("cohort")).cast("int")
    out = (
        joined.select("cohort", off.alias("period_offset"), F.col(user_col))
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("active_users"))
        .select(
            "cohort",
            F.col("period_offset").cast("int"),
            F.col("active_users").cast("bigint"),
        )
    )
    if max_offset is not None:
        out = out.where(F.col("period_offset") <= max_offset)
    if with_rates:
        sizes = firsts.groupBy("cohort").agg(
            F.count(F.lit(1)).cast("bigint").alias("cohort_size")
        )
        out = out.join(F.broadcast(sizes), "cohort").select(
            "cohort",
            "period_offset",
            "active_users",
            "cohort_size",
            F.expr("(active_users * 1000000L) div cohort_size")
            .cast("bigint")
            .alias("retained_micro"),
        )
    return out


def user_journeys(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-user journey string: event types concatenated in
    deterministic ``(ts, order_col)`` order — the representation that
    lets every text-similarity operator (n-gram Jaccard, MinHash,
    SimHash) run unchanged over behavioral sequences. One shuffle
    (groupBy user); ordering via ``array_sort`` of structs, no window.
    """
    return events.groupBy(user_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col).alias("t"),
                            F.col(order_col).alias("o"),
                            F.col(type_col).alias("e"),
                        )
                    )
                ),
                lambda s: s["e"],
            ),
            " ",
        ).alias("journey")
    )


def funnel_reach_joins(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Skew-safe funnel variant: identical output to ``funnel_reach``,
    computed as K sequential min-after aggregations instead of one
    collected per-user array — the fallback when single users carry
    pathological funnel-event counts (the collected-array equivalent
    of the interlace hot-key hazard; here each stage is a
    map-side-combinable ``min`` + one keyed join, so no task ever
    materializes a user's full history).

    Cost: K keyed shuffles + K-1 joins (vs 1 shuffle for the array
    form). Prefer ``funnel_reach`` unless per-user event counts are
    unbounded. Equivalence is property-tested against the same Python
    oracle as the array form. ``within_seconds`` matches
    ``funnel_reach``'s conversion window (anchored at ``t0``).
    """
    if not stages:
        raise ValueError("stages must be a non-empty ordered list")
    if len(set(stages)) != len(stages):
        raise ValueError("stages must be distinct event types")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError(
            "within_seconds must be positive (pass None for no window)"
        )
    ev = events.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        F.col(type_col),
    )
    users = (
        ev.where(F.col(type_col).isin(list(stages)))
        .select(user_col)
        .distinct()
    )
    reach = None  # frame: (user, __t0, ..., __t{j})
    for j, stage in enumerate(stages):
        stage_ev = ev.where(F.col(type_col) == stage)
        if j == 0:
            cur = stage_ev.groupBy(user_col).agg(
                F.min("__us").alias("__t0")
            )
            reach = cur
        else:
            prev = f"__t{j - 1}"
            frontier_cols = [user_col, prev]
            if within_seconds is not None and prev != "__t0":
                frontier_cols.append("__t0")
            cond = F.col("__us") > F.col(prev)
            if within_seconds is not None:
                cond = cond & (
                    F.col("__us")
                    <= F.col("__t0") + int(within_seconds) * 1_000_000
                )
            cur = (
                stage_ev.join(
                    reach.where(F.col(prev).isNotNull()).select(
                        *frontier_cols
                    ),
                    user_col,
                )
                .where(cond)
                .groupBy(user_col)
                .agg(F.min("__us").alias(f"__t{j}"))
            )
            reach = reach.join(cur, user_col, "left")
    out = users.join(reach, user_col, "left")
    return out.select(
        F.col(user_col),
        F.array(
            *[F.col(f"__t{j}") for j in range(len(stages))]
        ).alias("reach"),
    )


def anomaly_days(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    trailing: int = 7,
    z: int = 3,
) -> DataFrame:
    """Daily event-count anomaly flags per event type: a day is
    anomalous when its count deviates from the TRAILING ``trailing``
    observed days' mean by more than ``z`` standard deviations — the
    monitoring primitive over an ingest/event stream.

    Integer-exact contract (cross-engine reproducible, no float
    sigma): with S = Σ counts and Q = Σ counts² over the k prior
    days, the z-test ``(n - S/k)² > z²·var`` multiplies through by
    k² into pure integer arithmetic::

        (n·k - S)² > z² · (Q·k - S²)

    Output: ``(event_type, day, n_events, trail_sum, trail_sumsq,
    flagged)`` for every (type, day) with a FULL trailing window (the
    first ``trailing`` observed days per type have no verdict and are
    omitted). Trailing = previous OBSERVED days for the type; a day
    with zero events is absent from the series (gap semantics are the
    caller's spine join if needed).

    Scale shape: one map-side-combinable (type, day) count, then
    per-type windows ordered by day — partition size is the day
    count, never the event count, so the window is bounded regardless
    of corpus scale. NULL timestamps are dropped (can't be dated).
    """
    if trailing <= 0:
        raise ValueError("trailing must be positive")
    daily = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(type_col).alias("event_type"),
            F.col(ts_col).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-trailing, -1)
    )
    stats = daily.select(
        "event_type",
        "day",
        "n_events",
        F.sum("n_events").over(w).cast("bigint").alias("trail_sum"),
        F.sum(F.col("n_events") * F.col("n_events"))
        .over(w)
        .cast("bigint")
        .alias("trail_sumsq"),
        F.count(F.lit(1)).over(w).alias("__k"),
    )
    # The z-test comparison runs in DECIMAL(38,0): with bigint, the
    # squared deviation overflows int64 once a (type, day) count
    # passes ~3e9 — realistic at corpus scale — and ANSI mode would
    # fail the job on legitimate data. 38 digits covers counts to
    # ~1e15/day; still exact integer arithmetic.
    dec = "decimal(38,0)"
    k = F.lit(trailing).cast(dec)
    dev = F.col("n_events").cast(dec) * k - F.col("trail_sum").cast(dec)
    spread_bound = F.lit(z * z).cast(dec) * (
        F.col("trail_sumsq").cast(dec) * k
        - F.col("trail_sum").cast(dec) * F.col("trail_sum").cast(dec)
    )
    return stats.where(F.col("__k") == trailing).select(
        "event_type",
        "day",
        "n_events",
        "trail_sum",
        "trail_sumsq",
        (dev * dev > spread_bound).alias("flagged"),
    )


def rolling_incidence(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window: int = 7,
) -> DataFrame:
    """Trailing-``window``-day incidence and week-over-week growth per
    event type on a DENSE calendar spine — the surveillance headline
    the reference's prevalence outputs feed downstream (reference
    produces the daily series via ``get_feature``; this is the
    standard rolling rollup epi consumers apply to it).

    Unlike ``anomaly_days`` (previous OBSERVED days), the spine here
    is calendar-dense: days with zero events are materialized, so
    "trailing 7 days" means calendar days and a quiet day drags the
    average down instead of being skipped.

    Output per (event_type, day) for EVERY day in the corpus' global
    [min, max] day range::

        n_events   bigint  that day's count (0 on quiet days)
        trail      bigint  sum over the trailing ``window`` days
                           (partial near the series start, like any
                           surveillance dashboard's warm-up)
        prior      bigint  sum over the ``window`` days before those;
                           NULL until both windows are full
        growth     double  trail / prior (NULL when prior is NULL/0)
                           — the reproduction-proxy ratio

    Scale shape: the only corpus-sized stage is one map-side-
    combinable (type, day) count; the spine is |types| x |days| rows
    (bounded by calendar time, not data volume), built from a 1-row
    min/max aggregate broadcast-crossed with the distinct types. The
    per-type windows sort day-count-sized partitions. Growth divides
    two exact bigints, so the double is cross-engine reproducible.
    NULL timestamps are dropped (can't be dated).
    """
    if window <= 0:
        raise ValueError("window must be positive")
    daily = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(type_col).alias("event_type"),
            F.col(ts_col).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    bounds = daily.agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr("interval 1 day")
            )
        ).alias("day")
    )
    types = daily.select("event_type").distinct()
    dense = (
        types.crossJoin(F.broadcast(spine))
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce(F.col("n_events"), F.lit(0))
            .cast("bigint")
            .alias("n_events"),
        )
    )
    w_cur = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(window - 1), 0)
    )
    w_prior = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(2 * window - 1), -window)
    )
    w_rn = Window.partitionBy("event_type").orderBy("day")
    staged = dense.select(
        "event_type",
        "day",
        "n_events",
        F.sum("n_events").over(w_cur).cast("bigint").alias("trail"),
        F.sum("n_events").over(w_prior).cast("bigint").alias("__prior"),
        F.row_number().over(w_rn).alias("__rn"),
    )
    prior_full = F.when(
        F.col("__rn") >= 2 * window, F.col("__prior")
    ).cast("bigint")
    return staged.select(
        "event_type",
        "day",
        "n_events",
        "trail",
        prior_full.alias("prior"),
        F.when(
            prior_full > 0,
            F.col("trail").cast("double") / prior_full.cast("double"),
        ).alias("growth"),
    )


#: Blind-exact-mode density threshold for :func:`contact_pairs`: when
#: the estimated CANDIDATE volume (sum over tolerance buckets of
#: n_b * (n_b + n_{b+1}), the exact fan-in of the bucket equi-join)
#: exceeds this, an unbounded call warns (or raises under
#: ``density_guard="raise"``). 100M candidates is ~10 GB of join
#: input on one key-space and grows quadratically with density — on a
#: dense stream the bounded modes (``min_contacts`` /
#: ``top_k_per_user`` / ``sample_rate``) are the production forms.
DENSE_CONTACT_CANDIDATES = 100_000_000


def _contact_candidate_estimate(
    events: DataFrame,
    ts_col: str,
    tolerance_s: int,
) -> DataFrame:
    """Lazy 1-row frame ``(est bigint)`` holding the exact candidate
    count of :func:`contact_pairs`' bucket equi-join (before the
    time/tie predicates): events are bucketed at tolerance
    granularity, and each left event meets its own plus the next
    bucket, so candidates = ``sum_b n_b * (n_b + n_{b+1})``. One
    tolerance-granular aggregate + a 1-row sum — the bucket frame has
    one row per active tolerance window, never event-sized, so the
    probe costs a map-side-combinable count even on 100 TB. (The
    ``lead`` window runs over that tiny bucket frame, not events.)"""
    tol_us = tolerance_s * 1_000_000
    sizes = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.expr(f"unix_micros({ts_col}) DIV {tol_us}").alias("__b")
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.orderBy("__b")
    return (
        sizes.select(
            "__b",
            "__n",
            F.when(
                F.lead("__b").over(w) == F.col("__b") + 1,
                F.lead("__n").over(w),
            )
            .otherwise(F.lit(0))
            .alias("__next"),
        )
        .agg(
            F.coalesce(
                F.sum(F.col("__n") * (F.col("__n") + F.col("__next"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("est")
        )
    )


def estimate_contact_candidates(
    events: DataFrame,
    ts_col: str = "ts",
    tolerance_s: int = 3600,
) -> int:
    """Eager form of :func:`_contact_candidate_estimate` — runs the
    tolerance-granular aggregate and returns the candidate count."""
    row = _contact_candidate_estimate(events, ts_col, tolerance_s).collect()[0]
    return int(row["est"] or 0)


def contact_pairs(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    tolerance_s: int = 3600,
    min_contacts: int | None = None,
    top_k_per_user: int | None = None,
    sample_rate: float | None = None,
    event_sample_rate: float | None = None,
    sample_seed: str = "cp0",
    density_guard: str = "raise",
) -> DataFrame:
    """Temporal contact graph: for every unordered user pair, count
    the event pairs that occurred within ``tolerance_s`` seconds of
    each other — the contact-tracing / co-activity primitive (who was
    active together), the event-stream sibling of the reference's
    interval-overlap joins.

    Each unordered EVENT pair with ``|t_a - t_b| <= tolerance`` is
    counted exactly once (ties on the timestamp are broken by event
    id); a user's co-occurrence with itself is excluded.

    Output: ``(user_a, user_b, n_contacts bigint)`` with
    ``user_a < user_b``.

    Scale shape — the naive form is an O(n²) time-range self-join in
    one task. Here time is cut into ``tolerance``-wide buckets: the
    left side replicates each event to its own and the NEXT bucket
    (2x fan-out), the right side keys by its bucket, and the
    candidate join is a plain equi-join on the bucket id — any pair
    within tolerance spans at most adjacent buckets, so the exact
    predicate only filters candidates that shared a bucket window.
    Matches are found exactly once (the right event's bucket equals
    exactly one of the left event's two replicas). Hot buckets are
    bounded by event density per tolerance window, and the final
    count is one combinable groupBy on the user pair.

    Bounded production modes — the exact form's OUTPUT is inherently
    quadratic-in-the-answer (every co-active pair), which no one can
    materialize at 100x scale; these keep the same schema and exact
    per-pair counts while bounding what leaves the aggregation:

    - ``min_contacts=m``: emit only pairs with ``n_contacts >= m``.
      Before the pair aggregation, a DEGREE UPPER BOUND prunes users
      who cannot reach ``m`` at all: per time bucket the event count
      is aggregated (a tolerance-granular frame, tiny), each event
      looks up its own plus both adjacent bucket sizes, and a user
      whose summed candidate bound is below ``m`` is semi-joined out
      of BOTH join sides — pair count ≤ either endpoint's candidate
      bound, so no qualifying pair is lost. In sparse real event
      streams this removes the long tail of one-off users before the
      quadratic candidate join, not after; the residual pair shuffle
      is map-side combined and the threshold filter sits directly on
      the aggregate.
    - ``top_k_per_user=k``: keep a pair iff it ranks in the top-k of
      EITHER endpoint (the mutual-kNN-union contact graph). Ranking
      runs on the aggregated PAIR frame (already far smaller than the
      candidate set), per-user window, ties broken by (n desc,
      partner asc) — deterministic and oracle-reproducible. Output is
      ≤ 2k rows per active user: linear in users, never quadratic.

    Both modes compose (threshold first, then rank).

    ``density_guard`` (default ``"raise"``): a BLIND exact call — no
    ``min_contacts``/``top_k_per_user``/``sample_rate``/
    ``event_sample_rate`` — cannot run the quadratic exact plan on a
    dense stream. Under the default the guard is FAIL-CLOSED but
    LAZY: construction stays job-free, and the candidate estimate
    (``sum_b n_b * (n_b + n_{b+1})``, one tolerance-granular
    aggregate over a tiny bucket frame) travels INSIDE the returned
    plan as a broadcast 1-row subtree whose ``raise_error`` fires at
    the first action if the estimate exceeds
    ``DENSE_CONTACT_CANDIDATES`` (100M), with concrete routing advice
    and the measured estimate in the message. The guard sits above
    the event scan and BELOW the bucket fan-out, so the quadratic
    candidate join cannot start before the estimate is known.
    ``"warn"`` keeps the legacy advisory behavior — NOTE it probes
    EAGERLY (one Spark scan+aggregate job at DataFrame-construction
    time, since Python warnings cannot be emitted from executors) —
    and ``"off"`` disables the guard entirely for deliberate
    exact-mode runs (benchmarks, small corpora), leaving construction
    lazy and the plan untouched. Bounded calls never probe and carry
    no guard subtree (zero overhead): the caller already chose a
    production form.

    - ``sample_rate=p`` (the COMPUTE bound, for dense streams where
      even the bounded modes' cost ≥ the exact form's — everyone is
      co-active with everyone, so per-candidate work is the bill):
      keep a deterministic p-fraction of unordered USER PAIRS,
      selected by an md5-derived predicate on the pair key, applied
      to candidates BEFORE the exact-count pair shuffle. The pair
      hash is ``h(u_a) XOR h(u_b)`` where ``h(u)`` is the first 8
      hex digits of ``md5(seed|u)`` — computed ONCE PER EVENT (n
      md5s), so the per-candidate cost is one integer XOR + compare,
      the same order as the time predicates themselves. (Hashing the
      pair key directly would evaluate an md5 per CANDIDATE — on a
      dense stream that is ~n²/buckets md5s and costs more than the
      exact form it was meant to bound; measured, not theorized.)
      XOR of two independent uniform hashes is uniform and symmetric
      (unordered pair, no min/max), so ``P[keep] = p`` per pair;
      draws are independent except across pair TRIANGLES (the three
      XORs of {u,v,w} are linearly dependent) — irrelevant for count
      estimation, documented for the record. Kept pairs carry their
      EXACT ``n_contacts`` (sampling is by pair, so no event pair of
      a kept pair is ever dropped); population aggregates scale by
      ``1/p``. Content-derived like the permutation test: any SQL
      engine replays the selected pair set bit-for-bit, and re-runs
      are exactly reproducible across partitionings. Composes with
      both bounds above (the degree prune's cap is p-independent and
      stays valid; the threshold then applies to the sampled pairs'
      exact counts).
    - ``event_sample_rate=q`` (the CANDIDATE bound): keep a
      deterministic q-fraction of EVENTS — md5 threshold on the
      event id, one hash per event — and run the whole operator on
      the thinned stream. This is the only mode that cuts the
      candidate JOIN FAN-IN itself: per-bucket populations drop to
      q*n_b, so candidates drop by q² (``sample_rate`` by contrast
      prunes pairs inside the join — per-candidate work shrinks but
      the enumeration does not; the sf1 sweep measured it
      candidate-bound at 93x for 10x data, vs q²=1% of candidates
      at q=0.1 here). The trade: per-pair ``n_contacts`` is now a
      count over the event sample — each qualifying event pair
      survives with probability q² (both endpoints kept), so
      ``n_contacts / q²`` estimates the true pair count and
      population totals scale the same way; counts of pairs sharing
      an event are positively correlated (event-level thinning is
      node sampling, not edge sampling — documented, irrelevant for
      per-pair expectations). The selection is content-derived (md5
      of seed|"ev"|event_id), so a SQL engine replays the surviving
      event set — and therefore every downstream count — bit-for-bit.
      Composes with every mode above; ``min_contacts``'s degree
      bound is computed on the thinned stream and so stays a valid
      upper bound for the thinned counts it thresholds.
    """
    if tolerance_s <= 0:
        raise ValueError("tolerance_s must be positive")
    if min_contacts is not None and min_contacts < 1:
        raise ValueError("min_contacts must be >= 1")
    if top_k_per_user is not None and top_k_per_user < 1:
        raise ValueError("top_k_per_user must be >= 1")
    if sample_rate is not None and not (0.0 < sample_rate <= 1.0):
        raise ValueError("sample_rate must be in (0, 1]")
    if event_sample_rate is not None and not (
        0.0 < event_sample_rate <= 1.0
    ):
        raise ValueError("event_sample_rate must be in (0, 1]")
    if density_guard not in ("off", "warn", "raise"):
        raise ValueError("density_guard must be 'off', 'warn' or 'raise'")
    tol_us = tolerance_s * 1_000_000
    sampling = sample_rate is not None and sample_rate < 1.0
    event_sampling = (
        event_sample_rate is not None and event_sample_rate < 1.0
    )
    # Fail-closed guard (the exact mode must not be invoked BLIND on
    # a dense stream). Bounded calls skip it entirely — the caller
    # already chose a production form — as do guard="off" callers
    # (e.g. a deliberate exact-mode benchmark).
    blind = (
        (min_contacts is None or min_contacts <= 1)
        and top_k_per_user is None
        and not sampling
        and not event_sampling
    )
    routing_advice = (
        "the exact mode is quadratic in stream density. Route through "
        "a bounded mode: event_sample_rate (thins the stream BEFORE "
        "the join - the only mode that cuts candidate volume itself, "
        "by q^2), sample_rate (exact counts on a deterministic pair "
        "sample), min_contacts (degree-bound pre-prune + threshold), "
        "or top_k_per_user - or pass density_guard='off' to force the "
        "exact form."
    )
    if density_guard == "warn" and blind:
        # legacy advisory mode: EAGER by necessity (warnings cannot be
        # emitted from executors) — one scan+aggregate Spark job at
        # construction time, documented in the docstring.
        est = estimate_contact_candidates(events, ts_col, tolerance_s)
        if est > DENSE_CONTACT_CANDIDATES:
            warnings.warn(
                f"contact_pairs: estimated candidate volume {est:,} "
                f"exceeds {DENSE_CONTACT_CANDIDATES:,}; "
                + routing_advice,
                stacklevel=2,
            )
    e = events.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__i"),
        F.unix_micros(F.col(ts_col)).alias("__t"),
    )
    if density_guard == "raise" and blind:
        # fail-closed AND lazy: the candidate estimate rides inside
        # the plan as a broadcast 1-row subtree. Construction runs no
        # job; at the first action the broadcast side materializes
        # BEFORE the candidate join's build stage (it feeds the event
        # frame both join sides read), and raise_error kills the job
        # past the threshold — a blind dense call cannot silently run
        # the quadratic plan, while a sparse one pays one extra tiny
        # aggregate over the same event scan. CaseWhen evaluates
        # branches lazily, so raise_error fires only when dense.
        guard = _contact_candidate_estimate(
            events, ts_col, tolerance_s
        ).select(
            F.when(
                F.col("est") > F.lit(DENSE_CONTACT_CANDIDATES),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "contact_pairs: estimated candidate "
                            "volume "
                        ),
                        F.col("est").cast("string"),
                        F.lit(
                            f" exceeds {DENSE_CONTACT_CANDIDATES:,}"
                            "; " + routing_advice
                        ),
                    )
                ).cast("boolean"),
            )
            .otherwise(F.lit(True))
            .alias("__dg_ok")
        )
        e = (
            e.crossJoin(F.broadcast(guard))
            .where(F.col("__dg_ok"))
            .drop("__dg_ok")
        )
    if event_sampling:
        # thin the STREAM before anything else: every downstream
        # stage — degree prune, bucket fan-out, candidate join —
        # sees q*n events, so candidate volume drops by q². One md5
        # per event, in its own seed domain ("ev") so composing with
        # sample_rate keeps the two draws independent. NULL event
        # ids hash to NULL and are dropped by the predicate — their
        # selection is undefined, and the oracle's NULL-propagating
        # || concatenation behaves identically.
        ev_threshold = int(round(event_sample_rate * 2**32))
        e = e.where(
            _u32_hash(
                F.lit(sample_seed), F.lit("ev"), F.col("__i").cast("string")
            )
            < F.lit(ev_threshold)
        )
    if sampling:
        # per-EVENT user hash (n md5s, never per candidate): the pair
        # predicate below is then one XOR + compare per candidate
        e = e.withColumn(
            "__h",
            _u32_hash(F.lit(sample_seed), F.col("__u").cast("string")),
        )
    if min_contacts is not None and min_contacts > 1:
        bucket = F.expr(f"__t DIV {tol_us}")
        sizes = e.groupBy(bucket.alias("__sb")).agg(
            F.count(F.lit(1)).alias("__bn")
        )
        # each event's candidate count is bounded by its own + both
        # adjacent buckets' event counts; summed per user this bounds
        # every pair count the user can participate in
        caps = (
            e.select(
                "__u",
                F.explode(
                    F.array(bucket - 1, bucket, bucket + 1)
                ).alias("__sb"),
            )
            .join(sizes, "__sb")
            .groupBy("__u")
            .agg(F.sum("__bn").alias("__cap"))
        )
        survivors = caps.where(F.col("__cap") >= min_contacts).select("__u")
        e = e.join(survivors, "__u", "left_semi")
    left = e.select(
        F.col("__u").alias("__ua"),
        F.col("__i").alias("__ia"),
        F.col("__t").alias("__ta"),
        *([F.col("__h").alias("__ha")] if sampling else []),
        F.explode(
            F.array(
                F.expr(f"__t DIV {tol_us}"),
                F.expr(f"__t DIV {tol_us} + 1"),
            )
        ).alias("__b"),
    )
    right = e.select(
        F.col("__u").alias("__ub"),
        F.col("__i").alias("__ib"),
        F.col("__t").alias("__tb"),
        *([F.col("__h").alias("__hb")] if sampling else []),
        F.expr(f"__t DIV {tol_us}").alias("__b"),
    )
    cond = (
        (F.col("__tb") >= F.col("__ta"))
        & (F.col("__tb") - F.col("__ta") <= tol_us)
        & (
            (F.col("__ta") < F.col("__tb"))
            | (F.col("__ia") < F.col("__ib"))
        )
        & (F.col("__ua") != F.col("__ub"))
    )
    if sampling:
        # deterministic pair-level Bernoulli(p): evaluated inside the
        # candidate join from the PRECOMPUTED per-event hashes, so
        # dropped pairs never reach the pair shuffle and the per-
        # candidate cost stays one XOR + one compare
        threshold = int(round(sample_rate * 2**32))
        cond = cond & (
            F.col("__ha").bitwiseXOR(F.col("__hb")) < F.lit(threshold)
        )
    j = left.join(right, "__b").where(cond)
    pairs = (
        j.select(
            F.least("__ua", "__ub").alias("user_a"),
            F.greatest("__ua", "__ub").alias("user_b"),
        )
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contacts"))
    )
    if min_contacts is not None and min_contacts > 1:
        pairs = pairs.where(F.col("n_contacts") >= min_contacts)
    if top_k_per_user is not None:
        directed = pairs.select(
            F.col("user_a").alias("__du"),
            F.col("user_b").alias("__dv"),
            "n_contacts",
        ).unionAll(
            pairs.select(
                F.col("user_b").alias("__du"),
                F.col("user_a").alias("__dv"),
                "n_contacts",
            )
        )
        w = Window.partitionBy("__du").orderBy(
            F.col("n_contacts").desc(), F.col("__dv").asc()
        )
        pairs = (
            directed.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= top_k_per_user)
            .select(
                F.least("__du", "__dv").alias("user_a"),
                F.greatest("__du", "__dv").alias("user_b"),
                "n_contacts",
            )
            .distinct()
        )
    return pairs


def reproduction_rate(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    si_weights: tuple[int, ...] = (1, 2, 3, 2, 1),
) -> DataFrame:
    """Instantaneous reproduction-number proxy per event type: the
    Cori-style estimator ``R_t = I_t / sum_s w_s * I_{t-s}`` with a
    discretized serial-interval weight vector ``w`` (Cori et al.
    2013, Am J Epidemiol — public method). Where
    ``rolling_incidence`` compares two UNIFORM trailing windows, this
    weights each lag individually — the shape epi consumers of the
    reference's daily incidence series actually fit.

    ``si_weights[s-1]`` is the INTEGER weight of lag ``s`` days; the
    total-infectiousness denominator ``lambda_num = sum_s w_s *
    I_{t-s}`` is therefore an exact bigint, and
    ``rt = I_t * sum(w) / lambda_num`` is one double division of
    exact integers — cross-engine reproducible. ``lambda_num`` and
    ``rt`` are NULL until every lag is inside the series (warm-up),
    and ``rt`` is NULL when the denominator is 0.

    Output per (event_type, day) on the DENSE calendar spine:
    ``(event_type, day, n_events bigint, lambda_num bigint,
    rt double)``.

    Scale shape: identical to ``rolling_incidence`` — one map-side-
    combinable (type, day) count, a calendar-bounded spine from a
    1-row bounds aggregate, and per-type lag windows over day-count-
    sized partitions. The lag chain is ``len(si_weights)`` window
    expressions sharing ONE window sort.
    """
    if not si_weights:
        raise ValueError("si_weights must be non-empty")
    if any(w < 0 for w in si_weights) or sum(si_weights) <= 0:
        raise ValueError("si_weights must be non-negative, sum > 0")
    daily = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(type_col).alias("event_type"),
            F.col(ts_col).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    bounds = daily.agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"), F.expr("interval 1 day")
            )
        ).alias("day")
    )
    types = daily.select("event_type").distinct()
    dense = (
        types.crossJoin(F.broadcast(spine))
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce(F.col("n_events"), F.lit(0))
            .cast("bigint")
            .alias("n_events"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lam = None
    for s, ws in enumerate(si_weights, start=1):
        term = F.lag("n_events", s).over(w) * F.lit(int(ws))
        lam = term if lam is None else lam + term
    n_lags = len(si_weights)
    total_w = int(sum(si_weights))
    staged = dense.select(
        "event_type",
        "day",
        "n_events",
        F.when(F.row_number().over(w) > n_lags, lam)
        .cast("bigint")
        .alias("lambda_num"),
    )
    return staged.select(
        "event_type",
        "day",
        "n_events",
        "lambda_num",
        F.when(
            F.col("lambda_num") > 0,
            (F.col("n_events") * F.lit(total_w)).cast("double")
            / F.col("lambda_num").cast("double"),
        ).alias("rt"),
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for every ordered pair of consecutive events of one
    user, count the ``(prev_type, next_type)`` transition and report
    its row-conditional probability — the behavioral-model /
    next-event-prediction summary (and the sequence prior a
    session-aware sampler wants).

    Ordering is ``(ts, tiebreak_col)`` within each user — the
    deterministic-tie convention of the inter-arrival profile (q132);
    NULL users/types/timestamps are excluded.

    Scale shape: one ``lag`` window partitioned by user (bounded by
    per-user event volume, the same shape q132 pins) and one
    combinable groupBy on the type-pair key (``|types|²`` rows at
    most). The probability divides two exact bigints per row of that
    tiny frame — broadcast of per-prev totals, no second data pass.

    Output: ``(prev_type, next_type, n bigint, p double)`` with
    ``p = n / Σ_next n`` (rows of the matrix sum to 1).
    """
    base = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__tb"),
    ).where(
        F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
        & F.col(ts_col).isNotNull()
    )
    w = Window.partitionBy("__u").orderBy("__ts", "__tb")
    pairs = base.select(
        F.lag("__t").over(w).alias("prev_type"),
        F.col("__t").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = counts.groupBy("prev_type").agg(
        F.sum("n").cast("bigint").alias("__tot")
    )
    return counts.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("__tot")).alias("p"),
    )
