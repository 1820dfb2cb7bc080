"""Record linkage / entity resolution: blocking → bounded-edit
verify → transitive clustering.

The master-data primitive the LLM-curation dedup stack doesn't cover:
``pipeline/dedup.py`` clusters DOCUMENTS by shingle overlap, while
entity resolution clusters short RECORDS (names, addresses) whose
duplicates differ by a character-level typo — shingle sets of a
15-char string are too sparse for Jaccard, but edit distance ≤ 2 is
decisive. Parity target: the reference has no analogue (its line
lists arrive pre-keyed); this is training-data extension surface,
same family as ``dedup.verify_pairs_edit_similarity``
(candidate→verify) but with BLOCKING-key candidate generation and
entity-id assignment over every input record.

Scale shape: candidates come from equi-self-joins on short blocking
keys (prefix and suffix of the normalized name — a typo near one end
still collides on the other key), unioned and de-duplicated BEFORE
the verify, so pair volume is Σ block_size² over the union of
blocks, never corpus². The verify is the JVM ``levenshtein`` with
its early-exit threshold; clustering reuses
``dedup.dedup_components``; singleton records (no candidate edge)
become their own entity via one left join — no driver loop anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["blocking_pairs", "resolve_entities"]


def _norm(col: Column) -> Column:
    """Case/whitespace-insensitive match key (the standard first
    normalization of name linkage; kept minimal so an external SQL
    engine reproduces it exactly)."""
    return F.lower(F.trim(col))


def blocking_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_len: int = 4,
    max_block: int | None = None,
) -> DataFrame:
    """Candidate record pairs via two blocking keys over the
    normalized name: the first ``block_len`` characters and the last
    ``block_len`` characters. A pair is a candidate if it collides on
    EITHER key (a typo inside one key leaves the other intact — the
    classic multi-pass blocking trade), emitted once (``id_a <
    id_b``, distinct across passes, self-pairs excluded).

    ``max_block`` drops blocks holding more than that many records
    before the self-join — the hot-block guard (an all-identical
    prefix, e.g. a shared honorific, would otherwise go quadratic).
    Dropping a block only removes CANDIDATES whose records still
    meet on their other key unless both keys are hot.

    Exactly-once without a distinct: a pair can collide on both of
    its keys, and de-duplicating 10⁷ candidate rows is a full
    shuffle of the pair stream. Instead each side carries its own
    prefix key and a suffix-block match is kept only when the two
    prefix keys DIFFER (the first-matching-band filter the MinHash
    banding path uses) — a narrow filter fused into the join stage,
    so the candidate stream never hits an exchange between the join
    and the edit-distance verify.

    Output: ``(id_a, id_b, name_a, name_b)`` — names ride along so
    the verify step needs no join back to the corpus.
    """
    if block_len <= 0:
        raise ValueError("block_len must be positive")
    base = df.select(
        F.col(id_col).alias("__rid"),
        F.col(name_col).alias("__name"),
        _norm(F.col(name_col)).alias("__norm"),
    ).where(F.col("__rid").isNotNull() & F.col("__name").isNotNull())
    keyed = base.select(
        "__rid",
        "__name",
        # left/right, not negative-start substring: the
        # shorter-than-block_len behavior of the latter is
        # engine-dependent; left/right agree everywhere.
        F.concat(F.lit("p:"), F.expr(f"left(__norm, {block_len})")).alias(
            "__pk"
        ),
        F.explode(
            F.array(
                F.concat(F.lit("p:"), F.expr(f"left(__norm, {block_len})")),
                F.concat(F.lit("s:"), F.expr(f"right(__norm, {block_len})")),
            )
        ).alias("__blk"),
    )
    if max_block is not None:
        if max_block < 2:
            raise ValueError("max_block must be at least 2")
        from pyspark.sql import Window

        keyed = keyed.withColumn(
            "__bn", F.count(F.lit(1)).over(Window.partitionBy("__blk"))
        ).where(F.col("__bn") <= max_block).drop("__bn")
    a = keyed.select(
        F.col("__blk"),
        F.col("__rid").alias("id_a"),
        F.col("__name").alias("name_a"),
        F.col("__pk").alias("__pk_a"),
    )
    b = keyed.select(
        F.col("__blk"),
        F.col("__rid").alias("id_b"),
        F.col("__name").alias("name_b"),
        F.col("__pk").alias("__pk_b"),
    )
    return (
        a.join(b, "__blk")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # first-matching-block dedup: count a both-keys pair at
            # its prefix collision only
            & (
                F.col("__blk").startswith("p:")
                | (F.col("__pk_a") != F.col("__pk_b"))
            )
        )
        .select("id_a", "id_b", "name_a", "name_b")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_edit: int = 2,
    block_len: int = 4,
    max_block: int | None = None,
) -> DataFrame:
    """Entity resolution over ``(id_col, name_col)`` records:

    1. candidates — multi-pass blocking (``blocking_pairs``);
    2. verify — keep pairs with ``levenshtein(name_a, name_b) <=
       max_edit``, computed with the JVM early-exit threshold form
       (cost is bounded by ``max_edit`` per comparison, not by name
       length) after a length-difference prefilter that is implied
       by the edit bound and costs one integer compare;
    3. cluster — connected components over the surviving edges
       (``dedup.dedup_components``): transitively linked records are
       one entity, entity id = min record id of the cluster;
    4. every record gets a row — records with no qualifying edge are
       their own entity (left join + coalesce, the q139 shape).

    The normalized name is used only for candidate generation; the
    edit bound runs on the RAW names (case differences are real
    edits). Callers wanting case-insensitive distance should
    pre-normalize the column — the operator stays a pure function of
    the input strings.

    Output: ``(record_id, entity_id, n_members bigint)`` — one row
    per input record; ``n_members`` is the entity's record count
    (via one combinable count over entity ids, broadcast-joined
    back).
    """
    if max_edit < 0:
        raise ValueError("max_edit must be non-negative")
    from diseasystore_spark.pipeline.dedup import dedup_components

    cand = blocking_pairs(
        df, id_col, name_col, block_len=block_len, max_block=max_block
    )
    edges = cand.where(
        (
            F.abs(F.length("name_a") - F.length("name_b"))
            <= F.lit(max_edit)
        )
        & (F.levenshtein("name_a", "name_b", max_edit) >= 0)
    ).select("id_a", "id_b")
    comp = dedup_components(edges)
    recs = df.select(F.col(id_col).alias("record_id")).where(
        F.col(id_col).isNotNull()
    )
    assigned = (
        recs.join(comp, recs["record_id"] == comp["id"], "left")
        .select(
            "record_id",
            F.coalesce(F.col("component"), F.col("record_id")).alias(
                "entity_id"
            ),
        )
    )
    sizes = assigned.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return assigned.join(sizes, "entity_id").select(
        "record_id", "entity_id", "n_members"
    )
