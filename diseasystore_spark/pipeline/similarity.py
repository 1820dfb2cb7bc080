"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk`` — exact brute-force top-k: the correctness baseline.
  Dot products are JVM array lambdas (``zip_with``/``aggregate``), the
  query side is broadcast, and ranking is a per-query window. At scale
  this is O(|queries| x |corpus|) — fine for small query batches.
- ``hyperplane_lsh_topk`` — the scale path: random-hyperplane LSH
  buckets (deterministic seeded planes), candidates = same-bucket
  rows (equi-join prunes the corpus), exact cosine rerank within the
  bucket. Recall < 1 by construction; increase ``num_planes`` tables
  or probe neighboring buckets for higher recall. An IVF variant
  (k-means coarse quantizer) would slot in the same shape: assign ->
  equi-join on centroid id -> rerank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    )


def _norm(vec: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({vec}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * "
            f"CAST(x AS DOUBLE))"
        )
    )


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k,
    deterministic tie-break on neighbor id, self-matches excluded.
    """
    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm("qv"))
    c = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", _norm("cv"))
    pairs = F.broadcast(q).crossJoin(c).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def embedding_dupes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    id_a < id_b and cosine >= threshold.

    Brute-force self-join baseline (exact). The scale path is the same
    LSH bucketing as ``hyperplane_lsh_topk``: bucket both sides, join
    on bucket, verify cosine — swap the cross join for the bucket join
    when the corpus outgrows broadcast size.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    ).withColumn("na", _norm("va"))
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    ).withColumn("nb", _norm("vb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cosine"),
    ).where(F.col("cosine") >= threshold)


def _planes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random +-1 hyperplanes via an explicit LCG
    (no RNG dependency; reproducible across engines)."""
    planes = []
    state = 123456789
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % 2147483648
            row.append(1.0 if state % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: str, num_planes: int, dim: int) -> Column:
    """Sign-pattern bucket id of a vector under the deterministic
    hyperplanes: bit p = (vec . plane_p) > 0."""
    planes = _planes(num_planes, dim)
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = f"array({', '.join(f'{v}D' for v in plane)})"
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> "
            f"CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def hyperplane_lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket, then exact
    cosine rerank. Output schema matches ``cosine_topk``."""
    bucket = lsh_bucket(vec_col, num_planes, dim)
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        bucket.alias("bucket"),
    ).withColumn("qn", _norm("qv"))
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        bucket.alias("bucket"),
    ).withColumn("cn", _norm("cv"))
    cand = q.join(c, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
