"""Backward as-of join — point-in-time enrichment.

For each left row, attach the single right row with the largest
``right_ts <= left_ts`` (optionally strictly ``<``) within the same
equi-key group. The classic uses: event → most recent prior dimension
version, trade → latest quote, purchase → last page view
(attribution). The reference engine has no row-wise as-of operator
(its as-of semantics are the ``slice_ts`` snapshot filter and the
fuzzy source-file match, SURVEY §2.3 J10); this operator is part of
the training-data-pipeline extension surface, oracle-checked against
DuckDB's native ``ASOF JOIN``.

Scale design — the union trick, not a range join: a naive formulation
(equi-join on keys + ``r.ts <= l.ts`` residual + top-1 window) makes
the per-key candidate space |L_k| x |R_k| inside the join before the
window prunes it. Instead we

1. union both sides into one frame (right payload packed into a
   struct so a match is always a *whole* right row, never a per-column
   mix of different rows),
2. take ``last(payload_struct, ignorenulls=True)`` over a window
   partitioned by the keys, ordered by (ts, side, tiebreak), framed
   unbounded-preceding..current — right rows sort before left rows at
   equal ts (after them for ``allow_exact_matches=False``), so the
   running "last seen right row" is exactly the as-of match,
3. keep left rows and unpack the struct.

One shuffle on the keys, linear per-key work after the sort, no
candidate blow-up, whole-stage codegen throughout. This is the same
shape Spark's own plans use for dense rank pruning; it survives hot
keys (a key's rows stay a single sorted run) and is the
merge-scan physical strategy a dedicated ASOF operator would pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MATCH = "__asof_match"
_SRC = "__asof_src"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
    allow_exact_matches: bool = True,
    tolerance_seconds: int | None = None,
    right_prefix: str = "",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join of ``right`` onto ``left``.

    Output = all left columns + each right payload column (non-key,
    non-ts), prefixed with ``right_prefix``, + ``<prefix><right_ts>``
    carrying the matched row's timestamp. Unmatched left rows keep
    NULLs (``how="left"``) or are dropped (``how="inner"``).

    ``tolerance_seconds`` voids matches older than the given gap
    (pandas ``merge_asof`` tolerance semantics). ``tiebreak`` orders
    right rows sharing (keys, ts) — the *last* row in that ordering
    wins; without it, duplicate (keys, ts) right rows make the match
    nondeterministic (same caveat as DuckDB ASOF).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if isinstance(on, str):
        on = [on]
    payload = [c for c in right.columns if c not in on and c != right_ts]
    out_names = {c: right_prefix + c for c in payload}
    out_ts = right_prefix + right_ts
    collisions = [
        n for n in [*out_names.values(), out_ts] if n in left.columns
    ]
    if collisions:
        raise ValueError(
            f"right output columns collide with left: {collisions}; "
            "set right_prefix"
        )

    # Pack the right row into one struct: the as-of match must be a
    # whole row — per-column last(ignorenulls) would mix columns of
    # different right rows when payload fields are themselves NULL.
    match_struct = F.struct(
        F.col(right_ts).alias(out_ts),
        *[F.col(c).alias(out_names[c]) for c in payload],
    )
    # Right rows must precede left rows at equal ts so the running
    # last-match includes them (exact matches allowed); strictly-before
    # flips the order.
    r_side = F.lit(0 if allow_exact_matches else 2)
    rightu = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        r_side.alias(_SRC),
        match_struct.alias(_MATCH),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
    )
    leftu = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SRC),
        F.lit(None).cast(rightu.schema[_MATCH].dataType).alias(_MATCH),
        *[c for c in left.columns if c not in on],
    )
    # Tiebreak: order right rows sharing (keys, ts) by their payload
    # fields (evaluated on the pre-window per-row struct; left rows
    # carry NULL and are already separated by _SRC).
    tb = [F.col(_MATCH)[out_names[c]] for c in (tiebreak or [])]
    w = (
        Window.partitionBy(*on)
        .orderBy(_TS, _SRC, *tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        rightu.unionByName(leftu)
        .withColumn(_MATCH, F.last(_MATCH, ignorenulls=True).over(w))
        .where(F.col(_SRC) == 1)
    )
    if tolerance_seconds is not None:
        merged = merged.withColumn(
            _MATCH,
            F.when(
                F.unix_micros(F.col(_TS))
                - F.unix_micros(F.col(_MATCH)[out_ts])
                <= tolerance_seconds * 1_000_000,
                F.col(_MATCH),
            ),
        )
    if how == "inner":
        merged = merged.where(F.col(_MATCH).isNotNull())
    return merged.select(
        *on,
        *[c for c in left.columns if c not in on],
        F.col(_MATCH)[out_ts].alias(out_ts),
        *[F.col(_MATCH)[out_names[c]].alias(out_names[c]) for c in payload],
    )


def point_in_time_features(
    spine: DataFrame,
    features: list[dict],
    spine_ts: str = "ts",
    allow_exact_matches: bool = False,
) -> DataFrame:
    """Point-in-time training-set assembly (the feature-store
    "training matrix" primitive): for each spine row (entity, ts,
    label...), attach from every feature frame the single row that
    was KNOWN at that timestamp — strictly before it by default, so
    no feature leaks the label's own moment. This is the multi-table
    composition of :func:`asof_join`; the reference's
    ``key_join_features`` is the interval-keyed epi analog over its
    SCD2 store (``R/DiseasystoreBase.R:286-506``), this one is the
    event-timestamped form a supervised pipeline needs.

    ``features`` is a list of dicts with keys ``df`` (the feature
    frame), ``on`` (entity key column(s)), ``ts`` (its event-time
    column), ``prefix`` (REQUIRED, non-empty — output namespacing),
    and optional ``tolerance_seconds`` / ``tiebreak`` passed through
    to :func:`asof_join`.

    Scale shape: one :func:`asof_join` per feature frame — each is
    one shuffle on the entity key with linear per-key merge work (the
    union trick; see the module docstring), so N feature tables cost
    N key-shuffles of spine+table, never a candidate blow-up, and
    AQE handles per-table skew independently.
    """
    seen: set[str] = set()
    out = spine
    for spec in features:
        prefix = spec.get("prefix", "")
        if not prefix:
            raise ValueError("every feature spec needs a non-empty prefix")
        if prefix in seen:
            raise ValueError(f"duplicate feature prefix {prefix!r}")
        seen.add(prefix)
        out = asof_join(
            out,
            spec["df"],
            on=spec["on"],
            left_ts=spine_ts,
            right_ts=spec.get("ts", "ts"),
            how="left",
            allow_exact_matches=allow_exact_matches,
            tolerance_seconds=spec.get("tolerance_seconds"),
            right_prefix=prefix,
            tiebreak=spec.get("tiebreak"),
        )
    return out
