"""Phase-level profile of the bench baseline workloads: times each
engine phase (missing-range planning, compute+merge+write, footer
pass, read-back) and reports Spark job counts per phase.

Usage: python scripts/profile_engine_phases.py
"""

from __future__ import annotations

import datetime
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    import bench
    from diseasystore_spark.session import get_spark

    spark = get_spark("profile-engine")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _warm = tempfile.mkdtemp(prefix="prof_warm_")
    spark.range(1000).repartition(4).write.mode("overwrite").parquet(_warm)
    spark.read.parquet(_warm).count()
    bench._warm_python_workers(spark)

    from pyspark.sql import functions as F

    from diseasystore_spark import (
        Diseasystore,
        FeatureHandler,
        drop_diseasystore,
        key_join_sum,
    )

    today = datetime.date(2024, 6, 1)

    def dummy_frame(ds, n, value_col, offset):
        rows = 32 * n
        return ds.spark.range(1, rows + 1).select(
            F.concat(F.lit("car_"), F.col("id")).alias("key_car"),
            ((F.col("id") % 3) * 2 + 4.0).alias(value_col),
            F.date_sub(
                F.lit(today), (F.col("id") * 2 - offset).cast("int")
            ).alias("valid_from"),
        ).withColumn("valid_until", F.date_add(F.col("valid_from"), 2))

    def make_store(n):
        class DummyBench(Diseasystore):
            _ds_map = {"n_cyl": "d_cyl", "vs": "d_vs"}
            d_cyl = FeatureHandler(
                compute=lambda start_date, end_date, slice_ts, source_conn, ds: (
                    dummy_frame(ds, n, "n_cyl", 1)
                ),
                key_join=key_join_sum,
            )
            d_vs = FeatureHandler(
                compute=lambda start_date, end_date, slice_ts, source_conn, ds: (
                    dummy_frame(ds, n, "vs", 0)
                ),
                key_join=key_join_sum,
            )

        root = tempfile.mkdtemp(prefix="bench_dummy_")
        return (
            DummyBench(
                spark,
                target_conn=root,
                source_conn="x",
                slice_ts=today,
                verbose=False,
            ),
            root,
        )

    tracker = sc.statusTracker()

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    def phase(label, fn):
        j0 = sc._jsc.sc().dagScheduler().nextJobId()
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        j1 = sc._jsc.sc().dagScheduler().nextJobId()
        print(f"  {label:42s} {dt*1000:9.1f} ms  jobs={j1 - j0}")
        return out

    # warm replicate (n=1), as bench.py does
    ds, root = make_store(1)
    start_warm = today - datetime.timedelta(days=32 * 2 + 1)
    ds.get_feature("n_cyl", start_warm, today).count()
    ds.get_feature("vs", start_warm, today).count()
    ds.key_join_features(
        "n_cyl", ["vs"], today - datetime.timedelta(days=30), today
    ).count()
    drop_diseasystore(ds.backend, schema="ds")
    shutil.rmtree(root, ignore_errors=True)

    print("== get_feature n=1000 (32k rows) ==")
    ds, root = make_store(1000)
    start = today - datetime.timedelta(days=32 * 1000 * 2 + 1)
    tbl = "ds.d_cyl"
    phase(
        "determine_missing_ranges (cold)",
        lambda: ds.determine_missing_ranges(tbl, start, today, today),
    )
    missing = ds.determine_missing_ranges(tbl, start, today, today)
    phase(
        "compute+merge+write (n_cyl)",
        lambda: ds._compute_and_store_range(
            "d_cyl", tbl, missing[0][0], missing[0][1], today
        ),
    )
    phase(
        "read-back + clip + count (n_cyl)",
        lambda: ds.get_feature("n_cyl", start, today).count(),
    )
    phase(
        "get_feature vs (full: plan+write+read)",
        lambda: ds.get_feature("vs", start, today).count(),
    )
    phase(
        "memoized get_feature n_cyl",
        lambda: ds.get_feature("n_cyl", start, today).count(),
    )
    phase(
        "memoized get_feature vs",
        lambda: ds.get_feature("vs", start, today).count(),
    )
    phase(
        "drop_diseasystore",
        lambda: drop_diseasystore(ds.backend, schema="ds"),
    )
    shutil.rmtree(root, ignore_errors=True)

    print("== key_join n=100 (3.2k rows) ==")
    ds, root = make_store(100)
    start_small = today - datetime.timedelta(days=32 * 100 * 2 + 1)
    ds.get_feature("n_cyl", start_small, today).count()
    ds.get_feature("vs", start_small, today).count()
    window = (today - datetime.timedelta(days=365), today)
    for i in range(3):
        phase(
            f"key_join_features run {i}",
            lambda: ds.key_join_features("n_cyl", ["vs"], *window).count(),
        )
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
