"""Deterministic sharded corpus output — the sink side of a training
pipeline.

Data loaders want a fixed number of shard files with (a) deterministic
membership (the same document lands in the same shard on every run, on
any cluster), (b) balanced sizes, and (c) a stable within-shard order.
``df.write`` alone guarantees none of these: file count follows the
partitioning, task scheduling perturbs row order, and re-runs shuffle
rows across files.

Membership is the same engine-portable md5 bucketing the sampling ops
use (``hash_hex``): shard = first-8-hex-digits mod n_shards — so a
document's shard can be recomputed by ANY system (a Python loader, a
SQL engine) without Spark.

Scale shape: one repartition shuffle keyed by the shard id,
``sortWithinPartitions`` rides the shuffle's sort machinery (no extra
exchange), and the write emits exactly one file per shard directory.
No driver-side collection at any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "shard_column",
    "write_corpus_shards",
    "read_shard",
    "reshard_corpus",
]


def shard_column(key: str, n_shards: int, salt: str = "") -> Column:
    """Deterministic shard id in [0, n_shards): the 32-bit integer
    encoded by the first 8 hex chars of md5(salt || '|' || key), mod
    ``n_shards`` — literally ``sample.hash_hex``'s bucket (same payload
    construction, so the two families stay in parity by reuse, and a
    salt containing quotes or a key needing backticks can't corrupt a
    SQL string — everything is Column API).
    Any md5-capable system recomputes a row's shard without Spark."""
    from diseasystore_spark.pipeline.sample import hash_hex

    return (
        F.conv(hash_hex(F.col(key), salt), 16, 10).cast("bigint") % n_shards
    ).alias("shard")


def write_corpus_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key: str,
    salt: str = "",
    order_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_shards`` hash-bucketed parquet shards under
    ``path/shard=K/``. Deterministic membership and (given
    ``order_within``, default ``[key]``) deterministic within-shard
    row order; re-running produces the same shard for every row."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    order = order_within if order_within is not None else [key]
    (
        df.withColumn("shard", shard_column(key, n_shards, salt))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", *order)
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )


def read_shard(
    spark: SparkSession, path: str, shard: int | None = None
) -> DataFrame:
    """Read the sharded corpus back; ``shard=`` prunes to one shard
    directory (partition pruning — only that directory's files are
    listed and scanned)."""
    df = spark.read.parquet(path)
    if shard is not None:
        df = df.where(F.col("shard") == shard)
    return df


def reshard_corpus(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    n_shards: int,
    key: str,
    salt: str = "",
    order_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Rebalance an existing hash-sharded corpus to ``n_shards`` new
    shards (e.g. the training fleet changed size and the data loader
    wants a different file count).

    Membership stays the same deterministic md5 bucket of ``key`` —
    rows move between shards only because the modulus (or ``salt``)
    changed, so the destination is byte-identical to sharding the
    original corpus directly at ``n_shards``: re-sharding composes
    with itself and with ``write_corpus_shards`` without drift.

    Plan shape: one full scan of the source (every row must be
    rehashed — inherent to resharding), one repartition shuffle on the
    new shard id, one file per destination shard. No driver-side
    collection at any size; the old ``shard`` column is dropped and
    recomputed, never trusted."""
    df = spark.read.parquet(src_path)
    if "shard" in df.columns:
        df = df.drop("shard")
    write_corpus_shards(
        df,
        dst_path,
        n_shards,
        key,
        salt=salt,
        order_within=order_within,
        mode=mode,
    )


def rendezvous_assign(
    df: DataFrame,
    shards: list[tuple[str, float]],
    key_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """Weighted rendezvous (highest-random-weight) shard assignment —
    the placement primitive whose defining property hash-mod lacks:
    adding or removing a shard moves ONLY the keys whose argmax shard
    changed (≈ its weight share), never reshuffles the corpus, and
    heterogeneous capacities are first-class via weights. The
    standard WRH score is used: per (key, shard), ``u = (h + 1) /
    (2^32 + 1)`` from the md5 of ``key|shard`` (portable-hash
    convention — any engine reproduces it), and the key lands on
    ``argmax_s ( -w_s / ln(u) )``.

    Map-only: the shard table is a plan literal (array of structs,
    |shards| is small by construction), the score transform and
    ``array_max`` argmax run inside codegen, no shuffle, no UDF.
    Ties are impossible for distinct shard names (distinct md5
    inputs), so the assignment is total and deterministic.

    Output: ``df`` plus ``out_col`` (the winning shard name).
    """
    if not shards:
        raise ValueError("shards must be non-empty")
    names = [n for n, _ in shards]
    if len(set(names)) != len(names):
        raise ValueError("shard names must be unique")
    if any(w <= 0 for _, w in shards):
        raise ValueError("shard weights must be positive")
    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists")
    stab = F.array(
        *[
            F.struct(F.lit(n).alias("n"), F.lit(float(w)).alias("w"))
            for n, w in shards
        ]
    )
    key = F.col(key_col).cast("string")
    scored = F.transform(
        stab,
        lambda s: F.struct(
            (
                -s["w"]
                / F.log(
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(key, F.lit("|"), s["n"])),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("double")
                        + F.lit(1.0)
                    )
                    / F.lit(4294967297.0)
                )
            ).alias("score"),
            s["n"].alias("shard"),
        ),
    )
    return df.withColumn(out_col, F.array_max(scored)["shard"])
