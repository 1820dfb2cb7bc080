"""Commit cost vs table span: prove a one-month scoped merge costs
O(changed months), independent of how many months the table holds.

For each month count M in {24, 120, 240}: build a month-partitioned
table with a CONSTANT per-month row count (so the data-plane work of
the one changed month is identical across M), then time a scoped
``update_snapshot`` revising a single month. Under the manifest
layout the untouched M-1 months are carried forward as references
inside the commit marker (one conditional put of a ~M-entry JSON);
the old hard-link layout did O(M) directory creations + links per
commit — and could not run on an object store at all.

Emits one JSON line:
    {"per_month_rows": R,
     "points": [{"months": M, "initial_write_s": ..,
                 "scoped_merge_s": .., "manifest_bytes": ..}, ...],
     "flatness": max(scoped)/min(scoped)}

Usage: python scripts/bench_commit_manifest.py [per_month_rows]
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

T = datetime.datetime
D = datetime.date


def main() -> None:
    per_month = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    from diseasystore_spark.session import get_spark
    from diseasystore_spark.storage.scd2 import ParquetFeatureStore

    spark = get_spark("commit-manifest-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    points = []
    for months in (24, 120, 240):
        # drop accumulated block-manager debt between points — long
        # sessions otherwise measure GC backlog, not the merge
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        root = tempfile.mkdtemp(prefix=f"commit_bench_{months}_")
        store = ParquetFeatureStore(
            spark, root, partition_granularity="month"
        )
        tid = "bench.features"
        n_rows = per_month * months

        def frame(bump: bool):
            base = spark.range(n_rows).select(
                F.col("id").alias("__i"),
                F.concat(F.lit("k"), F.col("id")).alias("key_id"),
                (F.col("id") % months).alias("__m"),
                (F.col("id") % 28 + 1).alias("__d"),
            )
            v = (
                F.when(F.col("__m") == 0, F.col("__i") * 2.0 + 1.0)
                .otherwise(F.col("__i") * 1.0)
                if bump
                else F.col("__i") * 1.0
            )
            return base.select(
                "key_id",
                v.alias("value"),
                F.make_date(
                    F.lit(2000) + (F.col("__m") / 12).cast("int"),
                    F.col("__m") % 12 + 1,
                    F.col("__d"),
                ).alias("valid_from"),
            ).withColumn("valid_until", F.date_add("valid_from", 2))

        t0 = time.perf_counter()
        store.update_snapshot(frame(False), tid, T(2024, 1, 1))
        initial_s = time.perf_counter() - t0

        # revise ONLY the first month; the scoped merge may not read
        # or rewrite the other M-1 months
        jan = frame(True).where(F.col("valid_from") <= F.lit(D(2000, 1, 31)))
        t0 = time.perf_counter()
        store.update_snapshot(
            jan, tid, T(2024, 2, 1),
            written_range=(D(2000, 1, 1), D(2000, 1, 31)),
        )
        scoped_s = time.perf_counter() - t0

        m2 = store._manifest_of(tid, 2)
        assert m2 is not None and len(m2["months"]) == months
        marker_path = os.path.join(
            store._commits_dir(tid), "2.json"
        )
        manifest_bytes = len(store.commit_backend.get(marker_path) or b"")
        # hard fact: exactly one month's references changed
        m1 = store._manifest_of(tid, 1)["months"]
        changed = [m for m in m1 if m2["months"][m] != m1[m]]
        assert changed == ["2000-01"], changed

        points.append(
            {
                "months": months,
                "initial_write_s": round(initial_s, 2),
                "scoped_merge_s": round(scoped_s, 2),
                "manifest_bytes": manifest_bytes,
            }
        )
        shutil.rmtree(root, ignore_errors=True)

    scoped = [p["scoped_merge_s"] for p in points]
    print(
        json.dumps(
            {
                "per_month_rows": per_month,
                "points": points,
                "flatness": round(max(scoped) / min(scoped), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
