"""ORC source/sink — the columnar interchange format of the Hive /
Trino world (the reference's CSV/parquet surface covers the R-stack
formats; a Spark-native engine additionally meets ORC-resident
warehouses: Hive ACID tables, Trino exports, Hadoop archival data).

Spark ships the ORC reader/writer natively (``spark.read.orc``), with
the same scan machinery parquet gets: column pruning, predicate
pushdown into ORC's stripe/row-group statistics, and split-per-stripe
parallelism — so an ORC corpus scans with the identical plan shape as
a parquet one (``PushedFilters`` appears in the explain the same
way). This module is the thin, explicit wrapper matching the repo's
jsonl/csv posture: explicit schema on read (inference = an extra
footer-listing pass over every file; a 100 TB directory listing is
not free), snappy compression, deterministic file fan-out on write.

ORC vs parquet, honestly: for this engine parquet is the primary
staging format (the whole testdata surface is parquet); ORC support
exists for INTEROP — reading warehouses we do not own and writing to
consumers that demand it — not because we recommend a second
columnar format in one pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_orc", "write_orc"]


def read_orc(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
) -> DataFrame:
    """Read an ORC dataset. Pass ``schema`` (DDL string) to skip
    footer inference and pin column order/pruning.

    Honest caveat on drift: Spark's ORC reader CONVERTS convertible
    scalar mismatches (a bigint file column read as timestamp /
    string / double yields converted values, measured) and only
    errors on structurally incompatible requests (e.g. scalar read
    as array). The explicit schema is a pruning/ordering/stability
    pin, not a type-equality assertion — callers needing strict
    parity should compare ``spark.read.orc(path).schema`` first."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    n_files: int | None = None,
    compression: str = "snappy",
) -> None:
    """Write ``df`` as an ORC dataset (overwrite).

    ``n_files`` pins the output fan-out via ``repartition`` — the
    shard-count lever (many small files for downstream parallel
    consumers, few large ones for archival). Left as None, the
    current partitioning rides through unchanged (no extra shuffle).
    """
    if n_files is not None:
        df = df.repartition(int(n_files))
    df.write.mode("overwrite").option("compression", compression).orc(path)
