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
2. **tree merge of the local skylines** — iterated
   ``coalesce(p // k)`` + local-skyline rounds, so every merge task
   sees a bounded number (~k) of already-pruned candidate sets, and
   the final single task merges k sets instead of ALL partitions'
   candidates at once (the old ``coalesce(1)`` design was O(S²) on
   one core for anti-correlated dimensions, where the candidate
   union S is large even when the true skyline is not).

The deliberate Python-in-path exception: dominance is a set-based
filter with no efficient relational form — the SQL formulation the
oracle uses IS the quadratic self-join this plan avoids. Work is
O(n_p · s_p) per partition (s_p = local skyline size); every merge
round prunes dominated candidates before they reach the next level.
For adversarial data where the skyline ITSELF is large the output
bound is irreducible — the tree merge bounds the per-task fan-in,
not the final skyline size.

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
            # Null check BEFORE any dtype conversion: a NaT in a
            # timestamp dimension would otherwise become int64 min,
            # slip past np.isnan, and silently corrupt dominance
            # (under "min" it dominates the whole partition).
            if col.isna().any():
                raise ValueError(
                    f"skyline dimension column {c!r} must be non-null "
                    "(null rows would corrupt the dominance set)"
                )
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
        # Decreasing-coordinate-sum order: any dominator sorts
        # strictly before everything it dominates (y dom x => every
        # coord >=, one > => sum(y) > sum(x)), so testing each row
        # against the KEPT set alone is exact. The scan is chunked:
        # each chunk is tested against the kept matrix in one
        # vectorized comparison (blocked over K to bound memory), and
        # only the survivors fall through to a Python loop against
        # THIS chunk's new keeps — so Python-level iteration is
        # proportional to the candidate set, not the partition (the
        # old per-row loop was the sf1 bottleneck: ~6M iterations).
        n, d = X.shape
        order = np.argsort(-X.sum(axis=1), kind="stable")
        Xs = X[order]
        kept_pos: list[int] = []
        K = np.empty((0, d))
        CH, KB = 2048, 8192
        for start in range(0, n, CH):
            C = Xs[start:start + CH]
            dom = np.zeros(len(C), dtype=bool)
            for kb in range(0, K.shape[0], KB):
                alive = np.nonzero(~dom)[0]
                if alive.size == 0:
                    break
                Kb = K[kb:kb + KB]
                Ca = C[alive]
                blk = (
                    (Kb[None, :, :] >= Ca[:, None, :]).all(axis=2)
                    & (Kb[None, :, :] > Ca[:, None, :]).any(axis=2)
                ).any(axis=1)
                dom[alive[blk]] = True
            new_start = len(kept_pos)
            for i in np.nonzero(~dom)[0]:
                x = C[i]
                ok = True
                for j in kept_pos[new_start:]:  # this chunk's keeps
                    y = Xs[j]
                    if (y >= x).all() and (y > x).any():
                        ok = False
                        break
                if ok:
                    kept_pos.append(start + int(i))
            K = Xs[kept_pos]
        yield pdf.iloc[sorted(int(order[j]) for j in kept_pos)]

    from diseasystore_spark.pipeline._util import spread

    schema = df.schema
    # spread(): a single-file input would run the whole local-skyline
    # dominance scan on ONE task; the local pass is correct under ANY
    # partitioning (the final t=1 merge compares every surviving
    # candidate), so round-robin to the session's parallelism. No-op
    # at cluster scale where the scan already has enough splits.
    out = spread(df).mapInPandas(local, schema)
    # Tree merge: halve-by-8 rounds sized off the cluster's
    # parallelism, so each merge task fans in ~8 pruned candidate
    # sets and the final task is bounded — never a single merge over
    # ALL partitions' local skylines. repartition() (not coalesce):
    # coalesce is narrow, so a trailing coalesce(1) would FUSE the
    # whole chain — including the supposedly-parallel local pass —
    # into one task (measured: the entire operator ran single-task).
    # The repartition exchanges carry only already-pruned candidate
    # rows, and the stage barrier keeps the local pass as wide as the
    # scan/spread.
    t = max(2, df.sparkSession.sparkContext.defaultParallelism)
    while t > 1:
        t = max(1, t // 8)
        out = out.repartition(t).mapInPandas(local, schema)
    return out
