"""HLL sketch rollups: error envelope vs exact distinct counts, and
the merge identity (shard sketches union to the whole-corpus answer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diseasystore_spark.pipeline.sketch import (
    distinct_sketches,
    merge_sketch_rollup,
)


def _data(spark):
    # 4 sources x overlapping user ranges; exact distincts known.
    rows = []
    for s in range(4):
        for u in range(s * 500, s * 500 + 2000):  # 2000/source, overlaps
            rows.append((f"src{s}", u))
    return spark.createDataFrame(rows, "source string, user_id long")


def test_sketch_error_envelope(spark):
    df = _data(spark)
    out = {r["source"]: r["estimate"]
           for r in distinct_sketches(df, ["source"], "user_id").collect()}
    exact = {r["source"]: r["n"]
             for r in df.groupBy("source")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    for s in exact:
        assert abs(out[s] - exact[s]) / exact[s] < 0.05, (s, out[s], exact[s])


def test_sketch_merge_equals_direct(spark):
    """Union of per-source sketches must estimate the global distinct
    count exactly as a directly-built global sketch does (same
    binaries -> deterministic union), and land within the envelope of
    the exact answer."""
    df = _data(spark)
    per_source = distinct_sketches(df, ["source"], "user_id")
    merged = merge_sketch_rollup(per_source, []).collect()[0]
    direct = (
        df.agg(F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))).alias("e"))
        .collect()[0]["e"]
    )
    assert merged["estimate"] == direct
    exact = df.select("user_id").distinct().count()
    assert abs(merged["estimate"] - exact) / exact < 0.05


def test_sketch_validates(spark):
    df = _data(spark)
    with pytest.raises(ValueError, match="at least one"):
        distinct_sketches(df, [], "user_id")
