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


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str = "doc_id",
    name_col: str = "member_name",
    payload_col: str = "payload",
    salt: str = "",
) -> DataFrame:
    """WebDataset-style corpus packing: rows become members of a
    fixed set of ``.tar`` shard files — the standard loader format
    for multimodal / LLM training data (sequential tar reads beat
    per-sample object GETs by orders of magnitude at training time).

    Membership is the engine-portable md5 bucketing of ``key_col``
    (``shard_column``), so any system can recompute a sample's shard;
    within a shard, members are written in ascending ``name_col``
    order (stable across runs and cluster layouts). Each member is
    stored with a fixed mtime of 0 so shard BYTES are deterministic,
    not just contents.

    Scale shape: ONE repartition keyed by shard id (each shard is
    one task's sequential tar stream — the format is append-only by
    nature) with ``sortWithinPartitions(shard, name)`` riding that
    same shuffle, and the tar assembly runs executor-side via
    ``mapInPandas`` over the stdlib ``tarfile`` (binary packing is
    exactly the "genuinely per-partition imperative" case the Pandas
    path exists for). Because rows arrive already ordered, members
    APPEND STREAMINGLY to the open tar as each Arrow batch lands —
    peak executor memory is one Arrow batch, NOT the shard's total
    bytes — and no driver-side collection happens at any size.

    Returns the MANIFEST as a DataFrame: ``(shard int, path string,
    n_members bigint, n_bytes bigint)`` — one row per written shard
    (empty shards produce no file and no row).
    """
    import os

    from diseasystore_spark.pipeline.sample import hash_hex  # noqa: F401

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    os.makedirs(out_dir, exist_ok=True)
    assigned = (
        df.select(
            shard_column(key_col, n_shards, salt=salt).alias("__shard"),
            F.col(name_col).cast("string").alias("__name"),
            F.col(payload_col).cast("binary").alias("__payload"),
        )
        .repartition(n_shards, "__shard")
        # rides the repartition shuffle (no extra exchange): rows
        # reach pack() grouped by shard and member-name ordered, so
        # the tar can be written streamingly, one open file at a time
        .sortWithinPartitions("__shard", "__name")
    )

    manifest_schema = (
        "shard int, path string, n_members bigint, n_bytes bigint"
    )

    def pack(batches):
        import io
        import tarfile

        import pandas as pd

        rows = []
        cur = {"shard": None, "tf": None, "path": None, "n": 0}

        def close_current():
            if cur["tf"] is not None:
                cur["tf"].close()
                rows.append(
                    (
                        cur["shard"],
                        cur["path"],
                        cur["n"],
                        os.path.getsize(cur["path"]),
                    )
                )
                cur["tf"] = None

        # Input is sorted (__shard, __name) within the partition —
        # a shard-id change is final, so each member streams straight
        # into the open tar; peak memory is one Arrow batch.
        for pdf in batches:
            for s, n, p in zip(
                pdf["__shard"], pdf["__name"], pdf["__payload"]
            ):
                s = int(s)
                if cur["tf"] is None or cur["shard"] != s:
                    close_current()
                    path = os.path.join(out_dir, f"shard-{s:05d}.tar")
                    cur.update(
                        shard=s,
                        tf=tarfile.open(path, "w"),
                        path=path,
                        n=0,
                    )
                payload = bytes(p)
                info = tarfile.TarInfo(name=n)
                info.size = len(payload)
                info.mtime = 0
                cur["tf"].addfile(info, io.BytesIO(payload))
                cur["n"] += 1
        close_current()
        yield pd.DataFrame(
            rows, columns=["shard", "path", "n_members", "n_bytes"]
        )

    return assigned.mapInPandas(pack, manifest_schema)


def read_tar_shards(
    spark: SparkSession,
    path_glob: str,
) -> DataFrame:
    """Read WebDataset-style ``.tar`` shards back into one row per
    member: ``(shard_path string, member_name string, payload
    binary)``. Built on Spark's ``binaryFile`` source (each shard is
    one task — matching how the shards were written) with stdlib
    ``tarfile`` extraction inside ``mapInPandas``; tar parsing is the
    honest per-partition imperative case, everything downstream is
    ordinary columns again."""
    out_schema = "shard_path string, member_name string, payload binary"

    def unpack(batches):
        import io
        import tarfile

        import pandas as pd

        for pdf in batches:
            paths, names, payloads = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        paths.append(path)
                        names.append(m.name)
                        payloads.append(tf.extractfile(m).read())
            yield pd.DataFrame(
                {
                    "shard_path": paths,
                    "member_name": names,
                    "payload": payloads,
                }
            )

    return (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
        .mapInPandas(unpack, out_schema)
    )
