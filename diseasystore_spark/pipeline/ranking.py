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


def bradley_terry_integer(
    comparisons: DataFrame,
    winner: str = "winner",
    loser: str = "loser",
    iterations: int = 3,
    scale: int = 10**6,
    precision: int = 10**12,
) -> DataFrame:
    """Bradley-Terry strength estimation from pairwise preference
    data — the aggregation step of preference/RLHF data curation
    (which completions, documents, or annotators win head-to-heads):
    ``P(i beats j) = s_i / (s_i + s_j)``, fitted with the classical
    MM update

        s_i' = W_i / Σ_j n_ij / (s_i + s_j)

    run for a FIXED number of iterations in scaled-INTEGER arithmetic
    (strengths in ``scale`` micro-units, each division a bigint
    ``div`` with a ``precision`` pre-scale), so every step is exact,
    order-independent, and bit-reproducible in any SQL engine — the
    same determinism design as ``graph.pagerank_integer``. Strengths
    are clamped to ≥ 1 micro-unit per iteration (an item that never
    wins has MLE 0; the clamp keeps later denominators defined).
    The MM update is scale-free, so no renormalization is applied —
    compare strengths by ratio, not absolutely.

    Self-comparisons and NULL endpoints are dropped. Items appearing
    only as losers still get rows (strength clamps to the floor).

    Scale shape: the comparison stream collapses ONCE to the
    canonical pair table ``(i, j, n_ij, w_ij)`` (combinable groupBy);
    each iteration is two equi-joins of that pair table with the
    item-strength frame (endpoint lookups, the Pregel message shape)
    plus one combinable groupBy — and the strength frame is
    ``localCheckpoint``-ed per round (lineage truncation, as in
    PageRank). Work per iteration is O(|pairs|), never items².

    Overflow bound: ``W_i * precision`` must fit int64 — with the
    defaults, up to ~9 million wins per item.

    Output: ``(item, games bigint, wins bigint, strength bigint)``
    with ``strength`` in micro-units.
    """
    if iterations < 1:
        raise ValueError("iterations must be at least 1")
    raw = comparisons.select(
        F.col(winner).alias("__w"), F.col(loser).alias("__l")
    ).where(
        F.col(winner).isNotNull()
        & F.col(loser).isNotNull()
        & (F.col(winner) != F.col(loser))
    )
    # One canonical-pair aggregation replaces the old directed
    # collapse -> undirected re-group -> reverse self-join pipeline
    # (three shuffles of the pair stream -> ONE): each comparison
    # lands on its unordered key (least, greatest) carrying a
    # wins-for-the-low-endpoint indicator, so a single combinable
    # groupBy yields both n_ij and w_ij, and the reverse direction is
    # derived by arithmetic (w_ji = n_ij - w_ij), not by a join.
    # Measured at sf0.1 (1.17M distinct pairs): the pair-table build
    # dropped from three ~1 s shuffles to one.
    canon = raw.select(
        F.least("__w", "__l").alias("__i"),
        F.greatest("__w", "__l").alias("__j"),
        F.when(F.col("__w") < F.col("__l"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("__low_won"),
    )
    pair = canon.groupBy("__i", "__j").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nij"),
        F.sum("__low_won").cast("bigint").alias("__wlow"),
    )
    games = (
        pair.selectExpr("__i", "__j", "__nij", "__wlow AS __wij")
        .unionByName(
            pair.selectExpr(
                "__j AS __i",
                "__i AS __j",
                "__nij",
                "__nij - __wlow AS __wij",
            )
        )
        .localCheckpoint()
    )
    items = games.groupBy("__i").agg(
        F.sum("__nij").cast("bigint").alias("games"),
        F.sum("__wij").cast("bigint").alias("wins"),
    ).localCheckpoint()
    s = items.select(
        "__i", F.lit(int(scale)).cast("bigint").alias("__s")
    ).localCheckpoint()
    for _ in range(iterations):
        si = s.selectExpr("__i AS __si_key", "__s AS __si")
        sj = s.selectExpr("__i AS __sj_key", "__s AS __sj")
        denom = (
            games.join(si, games["__i"] == F.col("__si_key"))
            .join(sj, games["__j"] == F.col("__sj_key"))
            .select(
                "__i",
                F.expr(
                    f"__nij * CAST({precision} AS BIGINT)"
                    " div (__si + __sj)"
                ).alias("__t"),
            )
            .groupBy("__i")
            .agg(F.sum("__t").cast("bigint").alias("__d"))
        )
        s = (
            items.join(denom, "__i")
            .select(
                "__i",
                F.expr(
                    f"greatest(wins * CAST({precision} AS BIGINT)"
                    " div __d, CAST(1 AS BIGINT))"
                ).alias("__s"),
            )
            .localCheckpoint()
        )
    return (
        items.join(s, "__i")
        .select(
            F.col("__i").alias("item"),
            "games",
            "wins",
            F.col("__s").alias("strength"),
        )
    )
