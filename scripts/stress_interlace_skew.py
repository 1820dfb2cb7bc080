"""Interlace worst-case key-skew measurement (VERDICT r2 #3): a
single-nation feature pair puts every row in ONE key group, so the
spine containment join degenerates to |spine| x |rows| comparisons in
a single task unless the bucketed path splits it.

Measures truncate_interlace wall time with and without
interlace bucketing at growing sizes; numbers land in NOTES.md.

Usage: python scripts/stress_interlace_skew.py
"""

from __future__ import annotations

import datetime
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def make_pair(spark, n: int):
    """SCD2-shaped hot key: every row in ONE key group, validity
    intervals SEQUENTIAL per table (feature tables never overlap per
    key — that is the SCD2 contract the engine stores enforce), the
    three tables' breakpoints mutually offset so the interlace spine
    is dense. Output cardinality is linear in n; the only quadratic
    risk is the single-group sort-merge residual scan the bucketed
    path exists to break up."""
    base = spark.range(n).select(
        F.lit("DK").alias("key_nation"),
        F.col("id"),
        F.date_add(
            F.lit(datetime.date(1950, 1, 1)), (F.col("id") * 3).cast("int")
        ).alias("valid_from"),
    )
    a = base.select(
        "key_nation",
        (F.col("id") % 97).cast("double").alias("n_cases"),
        "valid_from",
        F.date_add("valid_from", 3).alias("valid_until"),
    )
    b = base.select(
        "key_nation",
        (F.col("id") % 13).cast("double").alias("n_tests"),
        F.date_add("valid_from", 1).alias("valid_from"),
        F.date_add("valid_from", 4).alias("valid_until"),
    )
    c = base.select(
        "key_nation",
        (F.col("id") % 7).cast("double").alias("n_admits"),
        F.date_add("valid_from", 2).alias("valid_from"),
        F.date_add("valid_from", 5).alias("valid_until"),
    )
    return a, b, c


def main() -> None:
    from diseasystore_spark.operators.interlace import truncate_interlace
    from diseasystore_spark.session import get_spark

    spark = get_spark("stress_interlace")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    from diseasystore_spark.operators.interlace import resolve_bucket_days

    for n in (10_000, 30_000, 100_000):
        a, b, c = make_pair(spark, n)
        a = a.localCheckpoint()
        b = b.localCheckpoint()
        c = c.localCheckpoint()
        auto_w = resolve_bucket_days([a, b, c], ["key_nation"])
        print(f"n={n} auto-resolved width: {auto_w}", flush=True)
        # The plain sort-merge path is O(|spine| x |rows|) inside the
        # single hot key group — run it only at the smallest size (at
        # 30k+ it exceeds a 10-minute budget, which IS the finding).
        buckets = ([None] if n <= 10_000 else []) + [30, "auto"]
        for bucket in buckets:
            t0 = time.perf_counter()
            cnt = truncate_interlace(a, [b, c], bucket_days=bucket).count()
            dt = time.perf_counter() - t0
            print(
                f"n={n} bucket_days={bucket}: {cnt} rows in {dt:.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
