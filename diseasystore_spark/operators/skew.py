"""Skew mitigation: deterministic key salting for hot-key joins.

AQE's skew-join splitting (enabled in the session factory) is the
first line of defense; explicit salting is the fallback when a single
key dwarfs every split target (e.g. a country-level location key in
the Google store joined against per-person rows, or a stop-phrase
shingle in dedup).

The construction: the large side scatters each row into one of
``salt`` sub-keys via a deterministic hash of a discriminator column
(no RNG — reproducible plans); the smaller-but-unbroadcastable side
replicates each row ``salt`` times via ``explode(sequence(...))``.
The join key becomes (key, salt), so the hot key's rows spread over
``salt`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
    discriminator: str | None = None,
) -> DataFrame:
    """Join ``large`` (skewed side) with ``small`` (replicated side)
    on ``on`` with ``salt``-way key salting.

    ``discriminator``: a column of ``large`` whose hash scatters rows
    of the same join key across salts; defaults to all non-key columns
    (rows identical in every column land on the same salt — harmless,
    they are duplicates anyway).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if discriminator is None:
        disc_cols = [c for c in large.columns if c not in keys]
    else:
        disc_cols = [discriminator]
    if not disc_cols:
        disc_cols = keys

    left = large.withColumn(
        "__salt", F.pmod(F.xxhash64(*disc_cols), F.lit(salt)).cast("int")
    )
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = left.join(right, [*keys, "__salt"], how)
    return joined.drop("__salt")


def skew_profile(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 10,
) -> DataFrame:
    """Join/aggregation-key skew profiler: per-key frequencies
    reduced to the numbers a scale decision needs — distinct-key
    count, total rows, the frequency distribution's median and p99
    (exact percentiles over the KEY frame, not the data), the heavy
    tail (top-k keys with counts), and the skew factor
    ``max_count / median_count``. This is the measurement step
    before reaching for :func:`salted_join` / AQE skew hints: a skew
    factor near 1 means salting would only add overhead; a 10³
    factor names the keys to salt.

    Scale shape: ONE map-side-combinable count on the key, then
    everything else runs on the KEY-cardinality frame (exact
    ``percentile``, a top-k rank window over that frame — the q45
    heavy-hitter allowance, bounded by key cardinality). Output: ONE
    row — ``(n_keys bigint, n_rows bigint, median_count double,
    p99_count double, max_count bigint, skew_factor double,
    top_keys array<struct<key string, n bigint>>)``; ties in the
    top-k break on the concatenated key string (deterministic).
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    counts = df.select(key.alias("__k")).groupBy("__k").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    w = Window.orderBy(F.col("__n").desc(), F.col("__k").asc())
    tops = (
        counts.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= top_k)
        .select(
            F.struct(
                F.col("__k").alias("key"), F.col("__n").alias("n")
            ).alias("__t"),
            "__r",
        )
    )
    top_arr = tops.agg(
        F.sort_array(F.collect_list(F.struct("__r", "__t")))
        .alias("__rt")
    ).select(
        F.transform(F.col("__rt"), lambda s: s["__t"]).alias("top_keys")
    )
    stats = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.percentile(F.col("__n"), F.lit(0.5)).alias("median_count"),
        F.percentile(F.col("__n"), F.lit(0.99)).alias("p99_count"),
        F.max("__n").cast("bigint").alias("max_count"),
    )
    return stats.crossJoin(F.broadcast(top_arr)).select(
        "n_keys",
        "n_rows",
        "median_count",
        "p99_count",
        "max_count",
        (
            F.col("max_count").cast("double") / F.col("median_count")
        ).alias("skew_factor"),
        "top_keys",
    )
