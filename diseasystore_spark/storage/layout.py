"""Z-order (Morton-curve) file layout for multi-column pruning.

Parquet scans prune row groups with min/max statistics; sorting by ONE
column gives perfect pruning on it and none on the others. Interleaving
the bits of several columns' normalized ranks (the Z-/Morton curve —
the public technique behind Delta's OPTIMIZE ZORDER and
Databricks/Iceberg clustering) makes every row group cover a small
hyper-rectangle, so predicates on ANY of the clustered columns skip
most groups.

Plan shape: per-column (min, max) in one tiny aggregate broadcast back
(no driver action), a JVM-side bit-interleave expression, then
``repartitionByRange`` + ``sortWithinPartitions`` on the z-value —
one range shuffle, the same cost as any global sort-for-layout. Linear
min/max normalization keeps the plan driver-free; heavily skewed
columns compress into few distinct ranks and degrade toward
single-column clustering (the documented trade — use a pre-computed
rank column for those).

``tests/test_layout.py`` verifies the claim mechanically: row-group
min/max spans read back with pyarrow must shrink on BOTH dimensions
vs a single-column sort of the same data.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "write_zordered"]


def _normalized_rank(col: str, bits: int) -> Column:
    """Map a numeric/timestamp column linearly onto [0, 2^bits - 1]
    using its broadcast (min, max); constant columns map to 0."""
    v = F.col(col)
    lo, hi = F.col(f"__zmin_{col}"), F.col(f"__zmax_{col}")
    span = hi - lo
    scaled = F.when(span == 0, F.lit(0)).otherwise(
        F.floor(
            (v.cast("double") - lo) / span * F.lit(float((1 << bits) - 1))
        )
    )
    return scaled.cast("bigint")


def zorder_value(cols: list[str], bits: int = 16) -> Column:
    """Morton interleave of the per-column ranks ``__zrank_<col>``
    (produced by ``write_zordered``); bit i of column j lands at
    position ``i * n_cols + j``. ``bits * len(cols)`` must fit the
    63 usable bits of a signed bigint."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"bits*cols = {bits * n} exceeds a signed bigint (63)"
        )
    terms: list[Column] = []
    for j, c in enumerate(cols):
        r = F.col(f"__zrank_{c}")
        for i in range(bits):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * n + j))
    return functools.reduce(operator.add, terms).alias("__z")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write ``df`` to ``path`` as parquet clustered on the Z-curve of
    ``cols``. ``num_files`` controls the range-partition count (file
    count ≈ row-group count locally; size for ~128 MB files at scale).
    """
    if not cols:
        raise ValueError("cols must name at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"__zmin_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__zmax_{c}"),
        ]
    bounds = df.agg(*aggs)
    ranked = df.crossJoin(F.broadcast(bounds))
    for c in cols:
        ranked = ranked.withColumn(f"__zrank_{c}", _normalized_rank(c, bits))
    z = ranked.withColumn("__z", zorder_value(cols, bits))
    (
        z.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop(
            "__z",
            *[f"__zrank_{c}" for c in cols],
            *[f"__zmin_{c}" for c in cols],
            *[f"__zmax_{c}" for c in cols],
        )
        .write.mode("overwrite")
        .parquet(path)
    )
