"""Corpus ingestion helpers: the pipeline-side sources.

Web-scale text corpora ship as JSONL (one document object per line,
possibly gzipped — The Pile / C4 / Dolma distribution format, public),
CSV, or parquet. ``read_corpus`` normalizes any of them to the
``(doc_id, text, ...)`` frame every pipeline operator takes.

Scale notes: JSONL and CSV readers are given an EXPLICIT schema —
schema inference runs a full extra pass over the data at read time
and silently widens types; at 100 TB that pass costs more than the
job. Gzip is not splittable (one file = one task), so sharded
``.jsonl.gz`` inputs parallelize by file count — keep shards at
~100-500 MB; parquet stays the preferred interchange (columnar
pruning + splittable row groups + typed schema in-file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_corpus", "CORPUS_SCHEMA"]

#: Default document-corpus schema (matches the testdata documents
#: table); pass ``schema=`` to override for richer corpora.
CORPUS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_corpus(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema: str | None = None,
    id_col: str = "doc_id",
    synthesize_ids: bool = False,
) -> DataFrame:
    """Load a document corpus as a normalized DataFrame.

    ``format``: ``parquet`` | ``jsonl`` (newline-delimited JSON, .gz
    transparent) | ``csv`` (headered). ``schema`` (DDL string)
    defaults to :data:`CORPUS_SCHEMA` for jsonl/csv — ALWAYS pass the
    real one rather than relying on inference (see module notes).

    ``synthesize_ids=True`` derives a deterministic 64-bit id from
    ``xxhash64(text)`` when the source has no id column — collisions
    are ~2^-64 per pair; exact-dup texts collapse to one id, which is
    usually what a dedup-bound pipeline wants anyway. Otherwise the
    source must provide ``id_col``.
    """
    if format == "parquet":
        df = spark.read.parquet(path)
    elif format == "jsonl":
        df = spark.read.schema(schema or CORPUS_SCHEMA).json(path)
    elif format == "csv":
        df = (
            spark.read.schema(schema or CORPUS_SCHEMA)
            .option("header", "true")
            .csv(path)
        )
    else:
        raise ValueError(
            f"format must be parquet/jsonl/csv, got {format!r}"
        )
    if synthesize_ids:
        df = df.withColumn(id_col, F.xxhash64(F.col("text")))
    elif id_col not in df.columns:
        raise ValueError(
            f"corpus has no {id_col!r} column — pass synthesize_ids=True "
            "to derive deterministic hash ids from the text"
        )
    return df
