"""JSONL (newline-delimited JSON) source — the lingua franca of LLM
training corpora (every public text dataset ships as .jsonl or
.jsonl.{gz,zst}). Spark's native json source IS line-delimited, so
this module is a thin, opinionated wrapper that makes the three
things a corpus ingest needs explicit:

- an EXPLICIT schema (schema inference reads the data twice and
  types drift between files; a corpus reader never wants that);
- corrupt-line CAPTURE instead of silent drops: mode=PERMISSIVE with
  a named corrupt-record column, so malformed lines become data rows
  a quarantine filter owns (the multimodal decode_error posture);
- compression transparency (.gz/.bz2 handled by the codec layer —
  note gz files are not splittable: one task per file, so shard
  corpora into many files at write time).

Scale shape: the json reader is a plain file scan — partitioned by
file/split, predicate pushdown on the parsed columns applies after
parsing (JSON has no column statistics; convert hot corpora to
parquet with ``to_parquet`` below for scan-bound workloads — the
measured reason columnar staging exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"

__all__ = ["read_jsonl", "split_corrupt", "write_jsonl"]


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
) -> DataFrame:
    """Read a JSONL corpus with an explicit schema; malformed lines
    survive as rows whose payload columns are NULL and whose
    ``_corrupt_record`` column holds the raw line.

    Deliberately built as ``text`` scan + ``from_json`` rather than
    the native json reader: the native reader forbids queries that
    reference only its corrupt-record column (it would have to
    re-parse), which breaks the quarantine pattern unless callers
    cache — this formulation has no such restriction, parses each
    line exactly once, and keeps the text scan splittable. A line
    that parses but violates a field's type keeps its parsable
    fields, NULLs the offending one, AND carries the raw line in the
    corrupt column (from_json PERMISSIVE + corrupt-record option) —
    so ``split_corrupt`` quarantines it while downstream still sees
    the salvageable fields if it opts to keep such rows."""
    if CORRUPT_COL in schema:
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            f"{schema}, {CORRUPT_COL} string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__row")
    )
    return parsed.select("__row.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the corrupt column
    dropped, and the offending raw lines. PERMISSIVE-mode caveat
    handled here so callers don't re-derive it: a line that parses
    but violates the schema's types also lands in quarantine."""
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write a frame as JSONL (one object per line). ``n_files``
    bounds the file count (a training-loader nicety); omit it to let
    the partitioning decide."""
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").json(path)
