"""Shared pipeline utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    Small corpora often arrive as one parquet file = one partition,
    which serializes CPU-heavy per-row work (hashing, shingling,
    decoding) onto a single task. One cheap shuffle of the raw rows
    unlocks all cores. At cluster scale inputs are already many-
    partitioned and this is a no-op cost-wise relative to the per-row
    work it parallelizes.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
