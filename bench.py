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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from diseasystore_spark.queries import QUERIES
    from diseasystore_spark.session import get_spark

    spark = get_spark("bench")
    # Warm the JVM / codegen path so the first timed query measures the
    # query, not executor startup (the reference baseline likewise
    # excludes R session startup).
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_query_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
