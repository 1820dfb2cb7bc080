"""Benchmark harness: run the registry queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print one JSON line.

Engine-backed queries (q01-q04) include the full SCD2 write path on
first touch — the analog of the reference's ``get_feature`` benchmark
(BASELINE.md) — and memoized reads afterwards.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _baseline_workloads(spark):
    """The reference's own benchmark workloads (BASELINE.md), ported
    1:1 so the numbers are apples-to-apples:

    - ``baseline_get_feature_32k``: mtcars-shaped dummy store with
      n=1000 repeats (32,000 rows, 2-day validity) — compute + SCD2
      snapshot write + log of ``n_cyl`` and ``vs``, then drop
      (``data-raw/benchmark.R:204-250``; reference: 3.5-6.1 s).
    - ``baseline_key_join_3k2``: n=100 (3,200 rows) — interlace ``vs``
      onto ``n_cyl`` + delta counting + date-spine cumsum, features
      pre-computed (``benchmark.R:253-295``; reference: 1.2-8.2 s).
    """
    import datetime
    import shutil
    import tempfile

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

    out = {}
    start = today - datetime.timedelta(days=32 * 1000 * 2 + 1)

    # Warm replicate (n=1, 32 rows): the reference numbers come from
    # `microbenchmark(times=10)` — by replicate 2 every code path is
    # JIT-warm. Run the identical store workload once at trivial size
    # so the timed replicate below measures the pipeline, not one-time
    # codegen for the merge/window/broadcast plans.
    ds, root = make_store(1)
    start_warm = today - datetime.timedelta(days=32 * 2 + 1)
    ds.get_feature("n_cyl", start_warm, today).count()
    ds.get_feature("vs", start_warm, today).count()
    ds.key_join_features(
        "n_cyl", ["vs"], today - datetime.timedelta(days=30), today
    ).count()
    drop_diseasystore(ds.backend, schema="ds")
    shutil.rmtree(root, ignore_errors=True)

    # get_feature benchmark: compute+store both features, then drop.
    # The headline number stays compute + drop (the reference workload);
    # the memoized repeat call (missing-range planner finds nothing,
    # snapshot read only) is reported separately — it is the steady-state
    # latency a production cache-hit sees.
    ds, root = make_store(1000)
    t0 = time.perf_counter()
    ds.get_feature("n_cyl", start, today).count()
    ds.get_feature("vs", start, today).count()
    t_compute = time.perf_counter() - t0
    t1 = time.perf_counter()
    ds.get_feature("n_cyl", start, today).count()
    ds.get_feature("vs", start, today).count()
    out["baseline_get_feature_32k_memoized"] = round(
        time.perf_counter() - t1, 3
    )
    t2 = time.perf_counter()
    drop_diseasystore(ds.backend, schema="ds")
    out["baseline_get_feature_32k"] = round(
        t_compute + time.perf_counter() - t2, 3
    )
    shutil.rmtree(root, ignore_errors=True)

    # key_join benchmark: features pre-computed, time the join pipeline.
    ds, root = make_store(100)
    start_small = today - datetime.timedelta(days=32 * 100 * 2 + 1)
    ds.get_feature("n_cyl", start_small, today).count()
    ds.get_feature("vs", start_small, today).count()
    window = (today - datetime.timedelta(days=365), today)
    t0 = time.perf_counter()
    ds.key_join_features("n_cyl", ["vs"], *window).count()
    out["baseline_key_join_3k2"] = round(time.perf_counter() - t0, 3)
    shutil.rmtree(root, ignore_errors=True)
    return out


def _conformance_workload(spark) -> dict:
    """Timed scaled-store conformance (VERDICT r8 item 5): the Google
    COVID-19 store at 4x fixture scale (25 locations x 56 days,
    gzipped by-age CSV) through the full exported conformance suite
    (``diseasystore_spark/testing.py``) — the reference vignette path
    (CSV source -> unpivot -> age-bin map -> key_join matrix) timed at
    more than toy size, so BENCH tracks the store-extension surface
    round-over-round, not just the registry queries."""
    import datetime
    import shutil
    import tempfile

    from diseasystore_spark.stores.google_covid19 import (
        GoogleCovid19Diseasystore,
    )
    from diseasystore_spark.testing import run_conformance_suite
    from tests.store_fixtures import write_google_fixtures

    root = tempfile.mkdtemp(prefix="bench_conf_")
    try:
        src = write_google_fixtures(
            os.path.join(root, "src"), gzip_by_age=True, scale=4
        )
        ds = GoogleCovid19Diseasystore(
            spark,
            target_conn=os.path.join(root, "store"),
            source_conn=src,
            slice_ts=datetime.date(2024, 1, 1),
            verbose=False,
        )
        t0 = time.perf_counter()
        run_conformance_suite(ds, test_start_date=datetime.date(2020, 3, 2))
        dt = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return {"conformance_google_scaled_4x": dt}


def _warm_python_workers(spark) -> None:
    """Spawn + warm the Python worker pool (one worker per core, each
    importing numpy/pandas) before the timed loop — one-time session
    initialization, same rationale as the JVM/codegen/committer warm
    above. Without this the FIRST query to cross the Python boundary
    (mapInPandas/applyInPandas) is charged the whole pool's
    fork+import latency (measured round 11: a 32-task stage with
    ~100 executor-seconds of wall at 3 CPU-seconds — pure worker
    startup), which misattributes session setup to that query.
    Workers are reused afterwards (spark.python.worker.reuse default).
    """

    def _imp(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        for b in it:
            yield b

    n = spark.sparkContext.defaultParallelism
    (
        spark.range(n * 100)
        .repartition(n)
        .mapInPandas(_imp, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from diseasystore_spark.queries import QUERIES
    from diseasystore_spark.session import get_spark

    spark = get_spark("bench")
    # Warm the JVM: codegen, shuffle, and the parquet committer, so the
    # first timed operation measures the work, not one-time session
    # initialization (the reference baseline likewise excludes R
    # session startup).
    import tempfile

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _warm = tempfile.mkdtemp(prefix="bench_warm_")
    spark.range(1000).repartition(4).write.mode("overwrite").parquet(_warm)
    spark.read.parquet(_warm).count()
    _warm_python_workers(spark)

    baselines = _baseline_workloads(spark)

    import gc

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink: materializes EVERY output column (a .count()
        # action lets Catalyst prune expensive result columns, which
        # hid a 5x cost on the LM-score family until sf1 profiling
        # caught it) — the honest "run the whole query" action.
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)
        # Release the query's localCheckpoint blocks between timings:
        # dropping the Python refs + forcing both GCs lets the
        # ContextCleaner unpersist, so later queries aren't taxed by
        # accumulated block-manager state (measured: up to 4x
        # inflation on late queries in a long sequential session).
        del df
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    timings.update(baselines)
    total += sum(baselines.values())
    n_queries = len(timings)

    # Timed LAST and NOT summed into the headline total: the
    # conformance suite is a ~2-minute store-extension workload
    # (dozens of engine writes), not a registry query — folding it
    # into the total (or running it before the timed loop, where its
    # block-manager debt would inflate early queries) would break the
    # round-over-round comparison. Reported under its own key in both
    # the compact line and BENCH_DETAIL.json; n_queries excludes it.
    conformance = _conformance_workload(spark)
    timings.update(conformance)

    # Full per-query detail goes to a file + stderr; stdout ends with ONE
    # compact JSON line so the driver's tail-capture parses it (r3's
    # 91-key line overflowed the capture window -> "parsed": null).
    detail = {
        "metric": "total_query_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(json.dumps(detail, indent=1))
    print(json.dumps(detail), file=sys.stderr)

    slowest = dict(
        sorted(
            (kv for kv in timings.items() if kv[0] not in conformance),
            key=lambda kv: kv[1],
            reverse=True,
        )[:5]
    )
    compact = {
        "metric": "total_query_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {**baselines, **conformance, **slowest},
        "sf": sf,
        "n_queries": n_queries,
        "detail": str(detail_path.name),
        "note": "conformance_* timed separately, excluded from value",
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
