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
    rows_per_block: int = 20_000,
    n_blocks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    id_a < id_b and cosine >= threshold. Exact (all pairs scored).

    Fully distributed block-grid matmul — no driver collect and no
    corpus broadcast at any size:

    1. every row gets a deterministic block id
       (``xxhash64(id) mod B``, B = ceil(N / rows_per_block) unless
       ``n_blocks`` is given);
    2. the B*(B+1)/2 unordered block pairs form a tiny grid frame
       that broadcast-joins against the corpus twice (left side on
       ``bi``, right side on ``bj``) — each row is replicated B+1
       times, the irreducible shuffle cost of exact all-pairs
       scoring;
    3. one cogrouped ``applyInPandas`` task per grid cell runs a
       chunked numpy matmul over its two blocks (BLAS — ~20x faster
       than per-pair JVM array lambdas, measured) and emits only the
       pairs above threshold.

    An unordered row pair lands in exactly ONE grid cell — the
    (min, max) of its two block ids (equal ids hash to the same
    block) — so no dedup shuffle is needed; same-block cells emit the
    strict upper triangle, cross-block cells orient each pair as
    (min id, max id). Per-task memory is two
    ``rows_per_block x D`` float64 matrices plus a bounded score
    tile, sized to executor memory via ``rows_per_block``.

    Exact all-pairs is O(N^2/2) dot products however it is
    partitioned — that is this operator's contract (it is the
    exactness baseline). For the subquadratic screen-then-verify path
    use ``hyperplane_lsh_topk`` / ``ivf_topk`` (bucket-pruned joins).
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    if n_blocks is None:
        n_rows = base.count()
        n_blocks = max(1, -(-n_rows // rows_per_block))
    blocked = base.withColumn(
        "__b", F.pmod(F.xxhash64(F.col("__id")), F.lit(n_blocks)).cast("int")
    )
    grid = (
        spark.range(n_blocks)
        .select(F.col("id").cast("int").alias("bi"))
        .crossJoin(
            spark.range(n_blocks).select(F.col("id").cast("int").alias("bj"))
        )
        .where(F.col("bi") <= F.col("bj"))
    )
    # Both sides derive from the same `blocked`/`grid` plans; aliasing
    # every output column mints fresh attribute ids so the cogroup's
    # self-join analysis is unambiguous.
    left = (
        blocked.alias("bl")
        .join(F.broadcast(grid.alias("gl")), F.col("bl.__b") == F.col("gl.bi"))
        .select(
            F.col("gl.bi").alias("bi"),
            F.col("gl.bj").alias("bj"),
            F.col("bl.__id").alias("lid"),
            F.col("bl.__v").alias("lv"),
        )
    )
    right = (
        blocked.alias("br")
        .join(F.broadcast(grid.alias("gr")), F.col("br.__b") == F.col("gr.bj"))
        .select(
            F.col("gr.bi").alias("bi_r"),
            F.col("gr.bj").alias("bj_r"),
            F.col("br.__id").alias("rid"),
            F.col("br.__v").alias("rv"),
        )
    )

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "cosine": np.array([], dtype=np.float64),
            }
        )

    def score(key: tuple, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return _empty()
        same_block = key[0] == key[1]
        lm = np.array(list(l["lv"]), dtype=np.float64)
        rm = np.array(list(r["rv"]), dtype=np.float64)
        lm /= np.linalg.norm(lm, axis=1, keepdims=True)
        rm /= np.linalg.norm(rm, axis=1, keepdims=True)
        lids = l["lid"].to_numpy()
        rids = r["rid"].to_numpy()
        # Chunk the left side so the score tile stays ~256 MB no
        # matter how large the blocks are.
        chunk = max(1, 32_000_000 // (8 * len(rids)))
        outs = []
        for s in range(0, len(lids), chunk):
            sims = lm[s : s + chunk] @ rm.T
            if same_block:
                mask = (sims >= threshold) & (
                    lids[s : s + chunk, None] < rids[None, :]
                )
            else:
                mask = sims >= threshold
            ia, ib = np.where(mask)
            if len(ia) == 0:
                continue
            a, b = lids[s + ia], rids[ib]
            outs.append(
                pd.DataFrame(
                    {
                        "id_a": np.minimum(a, b),
                        "id_b": np.maximum(a, b),
                        "cosine": sims[ia, ib],
                    }
                )
            )
        return pd.concat(outs) if outs else _empty()

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi_r", "bj_r"))
        .applyInPandas(score, schema="id_a bigint, id_b bigint, cosine double")
    )


def embedding_dupes_bucketed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int | str = 16,
    dim: int = 64,
    iterations: int = 0,
    portable: bool = True,
) -> DataFrame:
    """Scale-path embedding near-duplicate pairs: score only pairs
    sharing an IVF coarse cluster (SemDeDup-shaped pruning). The
    candidate join is equi on the cluster id, so the pair space is
    sum-of-cluster-sizes-squared instead of corpus² — the bucketed
    alternative ``embedding_dupes``'s docstring points to.

    Recall < 1 by construction: a pair straddling a cluster boundary
    is missed (``embedding_dupes`` is the exact baseline; tests
    measure the recall). With the default fixed quantizer
    (``iterations=0``: centroids = first ``n_clusters`` vectors by
    id) and ``portable=True`` assignment, the pair set is fully
    deterministic and a SQL oracle reproduces it exactly (q54).
    ``n_clusters="auto"`` resolves to the measured √N optimum
    (:func:`resolve_n_clusters`). Output: (id_a, id_b, cosine) with
    id_a < id_b.
    """
    n_clusters = resolve_n_clusters(df, n_clusters)
    centroids = ivf_centroids(
        df, id_col, vec_col, n_clusters, iterations, dim
    )
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    if portable:
        assigned = (
            base.withColumn("__d", _centroid_dists("__v", centroids))
            .withColumn(
                "cluster",
                (
                    F.expr("array_position(__d, array_min(__d))").cast("int")
                    - 1
                ),
            )
            .drop("__d")
        )
    else:
        assigned = _with_cluster(base, "__v", centroids)
    # Repartition on the join key BEFORE splitting into the two join
    # sides: both sides then sit above CANONICALLY IDENTICAL shuffle
    # subtrees, so AQE's runtime exchange reuse (visible as
    # ReusedExchange in the final plan once the sides are too big to
    # broadcast) materializes the (expensive, k-dot) assignment once
    # for the whole self-join instead of once per side, and the
    # cluster equi-join runs co-partitioned with no further shuffle.
    # Same device as semantic_dedup's checkpoint but lazy and
    # block-manager-free (measured sf1: 120.9 s -> 29.0 s).
    assigned = assigned.withColumn("__n", _norm("__v")).repartition(
        "cluster"
    )
    a = assigned.select(
        F.col("__id").alias("id_a"),
        F.col("__v").alias("va"),
        F.col("__n").alias("na"),
        "cluster",
    )
    b = assigned.select(
        F.col("__id").alias("id_b"),
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
        "cluster",
    )
    return (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (_dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


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


def _centroid_dists(vec_col: str, centroids: list[list[float]]) -> Column:
    """Array of squared L2 distances to each literal centroid.

    The distance is computed with the dot-product expansion
    ``v.v - 2 v.c + c.c`` — the SAME formula the q46 DuckDB oracle
    uses (``list_dot_product(v, v) - 2*list_dot_product(v, cv) +
    list_dot_product(cv, cv)``), with each dot a sequential
    left-to-right accumulation. Matching the formula (not just the
    math) keeps argmin assignment and probe sets aligned with the
    oracle on near-equidistant centroids; residual divergence is
    bounded to summation-order effects inside the other engine's dot
    product, not to a different algebraic form. Each distance
    expression appears exactly once — argmin is then computed from
    the materialized array behind a projection boundary (a naive
    when-chain would embed prior expressions twice per step and blow
    the expression tree up exponentially)."""
    vv = (
        f"aggregate(zip_with({vec_col}, {vec_col}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    )
    dists = []
    for c in centroids:
        arr = f"array({', '.join(f'{v}D' for v in c)})"
        vc = (
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> "
            f"CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
        )
        # c.c is a constant: fold it driver-side with the SAME
        # sequential left-to-right accumulation the engines use, so
        # the value is bit-identical to an in-engine dot product.
        cc = 0.0
        for v in c:
            cc += float(v) * float(v)
        dists.append(f"__vv - 2 * ({vc}) + {cc!r}D")
    # Bind v.v ONCE per row via a one-element transform (lambda
    # variable __vv) instead of re-evaluating the aggregate inside
    # every centroid's distance — k x fewer vector passes per row.
    return F.expr(
        f"transform(array({vv}), __vv -> array({', '.join(dists)}))[0]"
    )


def _with_cluster(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Nearest-centroid assignment (squared L2) as a vectorized Arrow
    batch: one numpy GEMM per batch against the broadcast k x d
    centroid matrix, using ``|v|^2 - 2 v.c + |c|^2``. The JVM
    higher-order-function path (one ``aggregate(zip_with(...))`` per
    centroid) evaluates k*d interpreted lambda frames per row and is
    ~10x slower at 5k x 64; dense distance math is the case where the
    Pandas path wins. Ties break to the lowest cluster index."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from diseasystore_spark.pipeline._util import spread

    from pyspark.sql import types as T

    cent = np.asarray(centroids, dtype=np.float64)
    cent_sq = (cent * cent).sum(axis=1)
    b_cent = df.sparkSession.sparkContext.broadcast((cent, cent_sq))
    # COPY the field list: StructType.add mutates in place, and when
    # spread() returns the input unchanged (already many-partitioned)
    # that would graft a phantom "cluster" field onto the INPUT
    # frame's cached schema and break mapInPandas column resolution.
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("cluster", T.IntegerType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c, c_sq = b_cent.value
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf["cluster"] = np.array([], dtype=np.int32)
                yield pdf
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) + c_sq[None, :]
            pdf["cluster"] = np.argmin(d2, axis=1).astype(np.int32)
            yield pdf

    return spread(df).mapInPandas(assign, schema=out_schema)


def resolve_n_clusters(df: DataFrame, n_clusters: int | str) -> int:
    """Resolve ``n_clusters="auto"`` to ``round(sqrt(N))`` (clamped
    to ``[2, N]``) — the measured optimum of the cluster-count
    tradeoff: assignment costs O(N·k·dim), the within-cell pair join
    O(N²/k), so k ≈ √N balances the linear and quadratic terms
    (SCALE.md round-9: 16 → 106.6 s, 160 ≈ √N → 29.5 s, 512 →
    89.1 s at N=20k), the same nlist ≈ √N guidance the round-7 ANN
    recall table pinned. Costs ONE count job (parquet-footer cheap);
    pass an int to skip the probe — fixed-quantizer oracle entries
    (q54/q112) do, since the cell count is part of their contract."""
    if n_clusters == "auto":
        n = df.count()
        return max(2, min(n, int(round(n**0.5)))) if n else 2
    if not isinstance(n_clusters, int) or n_clusters < 1:
        raise ValueError(
            f"n_clusters must be a positive int or 'auto', got "
            f"{n_clusters!r}"
        )
    return n_clusters


def ivf_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    iterations: int = 3,
    dim: int = 64,
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: k-means with centroids
    seeded from the first ``n_clusters`` vectors by id (no RNG), a few
    Lloyd iterations. Assignment runs distributed; only the k x dim
    centroid matrix ever reaches the driver."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from diseasystore_spark.pipeline._util import spread

    seeds = (
        df.orderBy(id_col)
        .limit(n_clusters)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    vecs = spread(df.select(vec_col))
    spark = df.sparkSession
    for _ in range(iterations):
        # Assignment AND per-partition partial sums in one Arrow pass:
        # each task emits at most n_clusters rows (cluster, count,
        # sum-vector), so the reduce shuffles O(partitions * k * d)
        # elements instead of O(rows * d) — the map-side-combine a
        # posexplode+groupBy formulation would not get for array data.
        cent = np.asarray(centroids, dtype=np.float64)
        cent_sq = (cent * cent).sum(axis=1)
        b_cent = spark.sparkContext.broadcast((cent, cent_sq))

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c, c_sq = b_cent.value
            kk, dd = c.shape
            sums = np.zeros((kk, dd), dtype=np.float64)
            counts = np.zeros(kk, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.array(list(pdf[vec_col]), dtype=np.float64)
                d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) + c_sq[None, :]
                lab = np.argmin(d2, axis=1)
                np.add.at(sums, lab, m)
                counts += np.bincount(lab, minlength=kk)
            hit = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {
                    "cluster": hit.astype(np.int32),
                    "n": counts[hit],
                    "s": list(sums[hit]),
                }
            )

        rows = (
            vecs.mapInPandas(
                partials, schema="cluster int, n long, s array<double>"
            )
            .select("cluster", "n", F.posexplode("s").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("sx"), F.sum("n").alias("sn"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        for r in rows:
            # one partial row per (partition, cluster) before the
            # posexplode, so sum(n) within (cluster, dim) is the
            # cluster's total count
            new_centroids[r["cluster"]][r["dim"]] = r["sx"] / r["sn"]
        centroids = new_centroids
    return centroids


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    iterations: int = 3,
    dim: int = 64,
    portable: bool = False,
) -> DataFrame:
    """IVF approximate top-k: assign the corpus to coarse clusters,
    probe each query's ``n_probe`` nearest clusters, exact-cosine
    rerank within the probed inverted lists. The candidate join is equi
    on cluster id — the same pruning shape as a vector database's IVF
    index, expressed as a DataFrame plan.

    ``portable=True`` assigns corpus vectors with the JVM argmin
    expression (``array_position(d, array_min(d))`` over the literal
    centroid distances) instead of the numpy GEMM path. The distance
    uses the oracle's own ``v.v - 2 v.c + c.c`` expansion (see
    ``_centroid_dists``), so the assignment agrees with a relational
    SQL argmin up to summation-order effects inside the other
    engine's dot product — which is what makes the fixed-quantizer
    variant (``iterations=0``, q46) DuckDB-verifiable in practice.
    The numpy path stays the default: at scale the vectorized Arrow
    batch is ~10x faster than interpreted per-centroid lambdas."""
    centroids = ivf_centroids(df, id_col, vec_col, n_clusters, iterations, dim)

    base = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    if portable:
        corpus = (
            base.withColumn("__d", _centroid_dists("cv", centroids))
            .withColumn(
                "cluster",
                (
                    F.expr("array_position(__d, array_min(__d))").cast("int")
                    - 1
                ),
            )
            .drop("__d")
        )
    else:
        corpus = _with_cluster(base, "cv", centroids)
    corpus = corpus.withColumn("cn", _norm("cv"))

    # each query probes its n_probe nearest centroids: sort the
    # (distance, cluster) structs of the materialized distance array
    q = (
        query_df.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
        .withColumn("qn", _norm("qv"))
        .withColumn("__dists", _centroid_dists("qv", centroids))
        .withColumn(
            "probe",
            F.explode(
                F.slice(
                    F.array_sort(
                        F.expr(
                            "transform(__dists, (d, i) -> struct(d AS d, "
                            "i AS cluster))"
                        )
                    ),
                    1,
                    n_probe,
                )
            ),
        )
        .select(
            "query_id", "qv", "qn", F.col("probe.cluster").alias("cluster")
        )
    )

    cand = q.join(corpus, "cluster").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (_dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


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


def embedding_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = None,
) -> DataFrame:
    """Squared distance of every vector to its (group) centroid — the
    embedding-space outlier signal: mislabeled, off-distribution, or
    corrupted documents sit far from their cluster/source centroid and
    get cut or audited. Compose with ``text.quality_outliers`` on the
    distance column for percentile-based flagging.

    Output: (id, [group,] dist2_centroid) with the distance rounded
    to 4 decimals — group-mean accumulation order differs across
    engines by ~1 ulp, so the raw double is not comparable but the
    rounded value is (q67's oracle).

    Scale shape: centroids via posexplode -> ONE map-side-combinable
    (group, dim) average — the shuffle carries dims x groups partial
    sums, not vectors; centroid arrays are rebuilt order-exactly
    (``array_sort`` of (dim, mean) structs) and BROADCAST (groups x
    dim doubles — tiny); the distance is a row-local ``zip_with``
    fold. No vector ever shuffles."""
    gcol = group_col if group_col is not None else "__g"
    base = df.select(
        F.col(id_col),
        *([F.col(group_col)] if group_col is not None else [F.lit(0).alias("__g")]),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    dims = base.select(
        gcol, F.posexplode("__v").alias("__dim", "__val")
    )
    cent = (
        dims.groupBy(gcol, "__dim")
        .agg(F.avg("__val").alias("__c"))
        .groupBy(gcol)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(__dim, __c))), "
                "s -> s.__c)"
            ).alias("__cv")
        )
    )
    dist2 = F.expr(
        "aggregate(zip_with(__v, __cv, (x, y) -> (x - y) * (x - y)), "
        "0D, (acc, e) -> acc + e)"
    )
    out = base.join(F.broadcast(cent), gcol).select(
        F.col(id_col),
        *([F.col(group_col)] if group_col is not None else []),
        F.round(dist2, 4).alias("dist2_centroid"),
    )
    return out


def knn_classify(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 10,
) -> DataFrame:
    """Majority-vote k-nearest-neighbor classification over exact
    cosine top-k (the label-transfer / auto-labeling primitive of a
    curation pipeline: propagate trusted labels onto unlabeled data).

    Output: ``(query_id, pred_label, votes)`` — one row per query;
    ``pred_label`` is the label with the most representatives among
    the query's ``k`` nearest corpus neighbors (self-matches
    excluded), deterministic tie-break on the smaller label.

    Plan: ``cosine_topk`` (broadcast query side × corpus scan, the
    exactness baseline — swap in the IVF/LSH candidate generators for
    billion-row corpora), a keyed join to recover neighbor labels,
    then a (query, label) count and a per-query top-1 window. All
    keyed shuffles; the window partitions on query_id (never global).
    """
    topk = cosine_topk(df, query_df, id_col=id_col, vec_col=vec_col, k=k)
    labels = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__lbl")
    )
    votes = (
        topk.join(labels, "neighbor_id")
        .groupBy("query_id", "__lbl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("__lbl")
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "query_id",
            F.col("__lbl").alias("pred_label"),
            F.col("votes").cast("bigint").alias("votes"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | str = 16,
    iterations: int = 0,
    threshold: float = 0.3,
    dim: int = 64,
    portable: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding space, then drop
    any vector whose cosine similarity to a LOWER-ID member of the
    SAME cluster is >= ``threshold`` (keep-first rule — one pass,
    deterministic, no transitive closure). The reference corpus-
    curation surface has no embedding-space dedup; this extends the
    LLM-pipeline family alongside ``embedding_dupes`` (exact
    all-pairs) and ``embedding_dupes_bucketed`` (LSH): here the
    candidate set is the k-means cell, the shape production semantic
    dedup uses at billion-vector scale.

    Output: ``(id, cluster, keep, kept_by)`` — one row per input
    vector; ``kept_by`` is the smallest cluster-mate id that evicted
    the vector (NULL when ``keep``).

    Scale shape: assignment is one row-local pass (numpy GEMM batch
    by default, JVM argmin expression in ``portable`` mode); the
    candidate join is equi on cluster id — pair volume is bounded by
    the largest cell, never corpus x corpus. The per-vector verdict
    is a map-side-combinable ``min`` — no window, no closure
    iteration. ``portable=True`` uses the oracle's own
    ``v.v - 2 v.c + c.c`` distance expansion (see
    ``_centroid_dists``), which makes the fixed-quantizer form
    (``iterations=0``) DuckDB-verifiable end to end (q112).
    ``n_clusters="auto"`` resolves to the measured √N optimum
    (:func:`resolve_n_clusters`) — the production setting; q112
    keeps the fixed 16-cell form because the cell count is part of
    its oracle contract.
    """
    n_clusters = resolve_n_clusters(df, n_clusters)
    centroids = ivf_centroids(df, id_col, vec_col, n_clusters, iterations, dim)
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    if portable:
        assigned = (
            base.withColumn("__d", _centroid_dists("__v", centroids))
            .withColumn(
                "cluster",
                (
                    F.expr("array_position(__d, array_min(__d))").cast("int")
                    - 1
                ),
            )
            .drop("__d")
        )
    else:
        assigned = _with_cluster(base, "__v", centroids)
    assigned = assigned.withColumn("__n", _norm("__v")).localCheckpoint()

    a = assigned.select(
        F.col("cluster"),
        F.col("__id").alias("__ida"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = assigned.select(
        F.col("cluster"),
        F.col("__id").alias("__idb"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    evicted = (
        a.join(b, "cluster")
        .where(F.col("__idb") < F.col("__ida"))
        .where(
            _dot("__va", "__vb") / (F.col("__na") * F.col("__nb"))
            >= F.lit(float(threshold))
        )
        .groupBy("__ida")
        .agg(F.min("__idb").alias("kept_by"))
    )
    return (
        assigned.join(evicted, assigned["__id"] == evicted["__ida"], "left")
        .select(
            F.col("__id").alias(id_col),
            "cluster",
            F.col("kept_by").isNull().alias("keep"),
            "kept_by",
        )
    )


def group_centroid_cosine(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Pairwise cosine similarity between GROUP CENTROIDS of an
    embedding column — the embedding-space drift/redundancy monitor
    (are two crawl slices, two dedup clusters, or this week's and
    last week's corpora pointing the same way?). Cheap by
    construction: everything data-sized reduces to one per-(group,
    dim) integer aggregation; the pairwise part runs on the
    |groups|×dims centroid frame, which is broadcast-sized by
    assumption (slices, clusters — not documents).

    Determinism-first: components quantize to ``1/scale`` units
    (``round(v·scale)`` bigint) and per-group component SUMS are the
    centroid representative — cosine is scale-invariant, so the
    cosine of sums IS the cosine of means, with no division ever
    entering the accumulation. Dot products and norms accumulate as
    decimal(38,0) (64 dims × (500k·1e6)² per-dim products pass 1e19 —
    int64 wraps); one final double division per pair. Any SQL engine
    reproduces the output bit-for-bit.

    Output: ``(group_a, group_b, n_a bigint, n_b bigint, cos
    double)`` for every unordered pair, group_a < group_b; groups
    with a zero-norm sum vector yield NULL cos (undefined).
    """
    comps = (
        df.where(F.col(group_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(
            F.col(group_col).alias("__g"),
            F.posexplode(F.col(vec_col)).alias("__d", "__v"),
        )
        .groupBy("__g", "__d")
        .agg(
            F.sum(
                F.round(F.col("__v").cast("double") * scale).cast("bigint")
            )
            .cast("decimal(38,0)")
            .alias("__s")
        )
    )
    sizes = (
        df.where(F.col(group_col).isNotNull() & F.col(vec_col).isNotNull())
        .groupBy(F.col(group_col).alias("__g"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    a = comps.select(
        F.col("__g").alias("group_a"),
        F.col("__d").alias("__d"),
        F.col("__s").alias("__sa"),
    )
    b = comps.select(
        F.col("__g").alias("group_b"),
        F.col("__d").alias("__d2"),
        F.col("__s").alias("__sb"),
    )
    dots = (
        a.join(
            b,
            (F.col("__d") == F.col("__d2"))
            & (F.col("group_a") < F.col("group_b")),
        )
        .groupBy("group_a", "group_b")
        .agg(
            F.sum(F.col("__sa") * F.col("__sb"))
            .cast("decimal(38,0)")
            .alias("__dot"),
            F.sum(F.col("__sa") * F.col("__sa"))
            .cast("decimal(38,0)")
            .alias("__naa"),
            F.sum(F.col("__sb") * F.col("__sb"))
            .cast("decimal(38,0)")
            .alias("__nbb"),
        )
    )
    return (
        dots.join(
            F.broadcast(sizes.withColumnRenamed("__g", "group_a")), "group_a"
        )
        .withColumnRenamed("__n", "n_a")
        .join(
            F.broadcast(sizes.withColumnRenamed("__g", "group_b")), "group_b"
        )
        .withColumnRenamed("__n", "n_b")
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            F.when(
                (F.col("__naa") > 0) & (F.col("__nbb") > 0),
                F.col("__dot").cast("double")
                / (
                    F.sqrt(F.col("__naa").cast("double"))
                    * F.sqrt(F.col("__nbb").cast("double"))
                ),
            ).alias("cos"),
        )
    )
