"""Isolated engine-path bench: the three baseline workloads (and
optionally the scaled conformance suite) exactly as bench.py times
them, with the same warmups, in a fresh JVM. For bisecting the
round-11 engine regression (VERDICT r11 item 1).

Usage:
    python scripts/bench_engine_path.py [--conformance] [--repeat N]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    conformance = "--conformance" in sys.argv
    repeat = 1
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    import tempfile

    import bench
    from diseasystore_spark.session import get_spark

    spark = get_spark("bench-engine-path")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _warm = tempfile.mkdtemp(prefix="bench_warm_")
    spark.range(1000).repartition(4).write.mode("overwrite").parquet(_warm)
    spark.read.parquet(_warm).count()
    if hasattr(bench, "_warm_python_workers"):
        bench._warm_python_workers(spark)

    for i in range(repeat):
        out = bench._baseline_workloads(spark)
        if conformance:
            out.update(bench._conformance_workload(spark))
        print(json.dumps({"run": i, **out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
