"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's built-in ``hll_sketch_agg``/``hll_union_agg``, public API).

The 100 TB pattern for distinct counting: exact ``count_distinct``
must shuffle every distinct value; an HLL sketch is a small fixed-size
binary that (a) aggregates map-side, (b) MERGES across shards, days,
or incremental loads without revisiting raw data, and (c) answers
within ~1.6% at lgK=12. Build per-partition/per-day sketch rows once,
persist them next to the data, and roll ANY grouping up from sketches
alone — the pre-aggregation that turns "distinct users per month"
from a corpus scan into a few-row merge.

No SQL oracle (the estimate is approximate by design); tests pin the
relative-error envelope against exact counts AND the merge identity
(union of shard sketches == whole-corpus sketch, exactly — the union
is deterministic on the same binaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["distinct_sketches", "merge_sketch_rollup"]


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-group HLL sketch of ``value_col``: (group_cols...,
    sketch binary, estimate bigint). Map-side combinable; the shuffle
    carries lgK-sized binaries, never the distinct values."""
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
    return (
        df.groupBy(*group_cols)
        .agg(sk.alias(sketch_col))
        .withColumn(
            "estimate", F.hll_sketch_estimate(F.col(sketch_col))
        )
    )


def merge_sketch_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Roll precomputed sketch rows up to a coarser grouping (possibly
    ``[]``-adjacent: pass the subset of the original group columns).
    Touches only sketch rows — the raw data is never re-read."""
    agg = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    if group_cols:
        out = sketches.groupBy(*group_cols).agg(agg)
    else:
        out = sketches.agg(agg)
    return out.withColumn(
        "estimate", F.hll_sketch_estimate(F.col(sketch_col))
    )
