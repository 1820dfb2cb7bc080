"""Rank-fusion operators.

Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) combines any
number of per-group rankings — BM25, embedding cosine, quality score,
recency — into one fused ordering without score calibration: each
ranking contributes ``1 / (k + rank)`` and the contributions add. The
reference's query surface has no multi-signal ranking; this extends the
LLM-pipeline retrieval family (``bm25_top_terms``, ``cosine_topk``)
with the standard way their outputs are combined in production search
and RAG stacks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: Sequence[tuple[DataFrame, str, bool]],
    id_col: str,
    group_cols: Sequence[str] = (),
    k: int = 60,
    scale: int = 10**9,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of ``rankings``.

    Each entry is ``(df, score_col, ascending)``: ``df`` carries
    ``id_col``, ``group_cols`` and ``score_col``; ranks are assigned
    per group by the score (ties broken on the id, so ranks — and
    therefore the fused output — are deterministic). An id missing
    from one ranking simply receives no contribution from it, the
    standard RRF treatment of top-N candidate lists.

    Contributions are exact integers — ``scale DIV (k + rank)`` — so
    the fused score ``rrf_nano`` (at the default ``scale`` of 1e9) is
    reproducible bit-for-bit across engines; floats never appear.

    Output: ``group_cols + (id_col, rrf_nano, fused_rank)``, filtered
    to ``fused_rank <= top`` when ``top`` is given.

    Scale shape: one union of the per-ranking (group, id, contrib)
    projections, one map-side-combinable sum, and per-group
    ``row_number`` windows. The windows sort within a group in a
    single task — the right shape for RRF's normal input (bounded
    candidate lists per query/group). Fusing an UNBOUNDED global
    ranking of a whole corpus is a different problem: feed rankings
    through the two-level bucketed rank (``epoch_shuffle`` / q95
    shape) first and fuse the bounded heads.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    gcols = list(group_cols)
    contribs = []
    for df, score_col, ascending in rankings:
        order = [
            F.col(score_col).asc() if ascending else F.col(score_col).desc(),
            F.col(id_col).asc(),
        ]
        w = Window.partitionBy(*gcols).orderBy(*order) if gcols else (
            Window.orderBy(*order)
        )
        contribs.append(
            df.select(*gcols, id_col, F.col(score_col))
            .withColumn("__rank", F.row_number().over(w))
            .select(
                *gcols,
                id_col,
                F.expr(
                    f"CAST({scale} AS BIGINT) DIV "
                    f"(CAST(__rank AS BIGINT) + {int(k)})"
                ).alias("__c"),
            )
        )
    fused = contribs[0]
    for c in contribs[1:]:
        fused = fused.unionByName(c)
    fused = fused.groupBy(*gcols, id_col).agg(
        F.sum("__c").cast("bigint").alias("rrf_nano")
    )
    w2 = (
        Window.partitionBy(*gcols).orderBy(
            F.col("rrf_nano").desc(), F.col(id_col).asc()
        )
        if gcols
        else Window.orderBy(F.col("rrf_nano").desc(), F.col(id_col).asc())
    )
    out = fused.withColumn("fused_rank", F.row_number().over(w2))
    if top is not None:
        out = out.where(F.col("fused_rank") <= int(top))
    return out
