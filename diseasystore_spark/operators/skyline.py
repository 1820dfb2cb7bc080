"""Distributed skyline (Pareto-optimal set) operator.

The skyline of a table under a set of "prefer larger" / "prefer
smaller" dimensions is the set of rows not DOMINATED by any other row
(dominated = at least as good on every dimension, strictly better on
one). A recognized OLAP operator (skyline/Pareto queries, public —
e.g. "Integration of Skyline Queries into Spark SQL", EDBT 2023)
that SQL can only express as an O(n²) NOT-EXISTS self-join.

Plan: the classic two-phase distributed algorithm —

1. **local skyline per partition** (Arrow-batched ``mapInPandas``,
   numpy dominance in decreasing-coordinate-sum order, so any
   dominator is scanned before everything it dominates and the kept
   set is always the partition's true skyline). Correct because
   global domination implies domination by some member of the
   dominator's local skyline (dominance is transitive);
2. **global skyline of the union of local skylines** — one
   ``coalesce(1)`` task over the (typically tiny) candidate union.

The deliberate Python-in-path exception: dominance is a set-based
filter with no efficient relational form — the SQL formulation the
oracle uses IS the quadratic self-join this plan avoids. Work is
O(n_p · s_p) per partition (s_p = local skyline size) + O(S²) in the
final task (S = candidate union size). For strongly correlated
dimensions S is near-constant; for adversarial anti-correlated data
the skyline itself is large and the output bound is irreducible.

Dimension columns must be non-null numerics or timestamps (compared
on their int64 micros); int64 magnitudes above 2^53 would lose
dominance resolution in the float64 comparison matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["skyline"]


def skyline(df: DataFrame, dims: dict[str, str]) -> DataFrame:
    """Rows of ``df`` not dominated under ``dims`` (col -> "max" |
    "min"). All input columns pass through; duplicates of a skyline
    point all survive (neither dominates the other)."""
    if not dims:
        raise ValueError("dims must map at least one column")
    bad = {c: d for c, d in dims.items() if d not in ("max", "min")}
    if bad:
        raise ValueError(f"directions must be 'max' or 'min', got {bad}")
    missing = [c for c in dims if c not in df.columns]
    if missing:
        raise ValueError(f"dimension columns not in frame: {missing}")

    dim_cols = list(dims)
    signs = [1.0 if dims[c] == "max" else -1.0 for c in dim_cols]

    def local(pdfs):
        import numpy as np
        import pandas as pd

        frames = list(pdfs)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        cols = []
        for c, s in zip(dim_cols, signs):
            col = pdf[c]
            if pd.api.types.is_datetime64_any_dtype(col):
                v = col.to_numpy().astype("datetime64[us]").astype("int64")
            else:
                v = col.to_numpy(dtype="float64")
            cols.append(v.astype("float64") * s)
        X = np.column_stack(cols)
        if np.isnan(X).any():
            raise ValueError(
                "skyline dimension columns must be non-null (NaN rows "
                "would survive every dominance test and corrupt the set)"
            )
        order = np.argsort(-X.sum(axis=1), kind="stable")
        kept: list[int] = []
        K = np.empty((0, X.shape[1]))
        for i in order:
            x = X[i]
            if K.shape[0]:
                dom = (K >= x).all(axis=1) & (K > x).any(axis=1)
                if dom.any():
                    continue
            kept.append(int(i))
            K = np.vstack([K, x[None, :]])
        yield pdf.iloc[sorted(kept)]

    schema = df.schema
    local_sky = df.mapInPandas(local, schema)
    return local_sky.coalesce(1).mapInPandas(local, schema)
