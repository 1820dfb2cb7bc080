"""Full-registry sf0.1 -> sf1 scaling sweep (VERDICT r8 item 2).

Runs EVERY registry query at sf0.1 and at the generated sf1
(``scripts/make_sf1.py``; relational tables replicated 10x with
key-space offsets, documents/embeddings generated fresh at 10x) with
the same honest noop-sink action and per-query GC discipline as
``bench.py``, and emits one line per measurement to a JSONL file as
it goes (a crash or timeout preserves the partial table).

Interpretation note for the resulting table (SCALE.md): sf1 holds 10x
the rows of sf0.1, so a ratio <= ~10 is at-or-below linear scaling.
Pair-emitting operators additionally scale with OUTPUT growth
(density x corpus^2 for time-bucketed pairs; multiplicity^2 for dup
groups) — for any query whose ratio exceeds 10, compare against its
output-row growth before calling the plan super-linear.

Usage::

    python scripts/sweep_sf1_full.py [sf1_dir] [out.jsonl]
"""

from __future__ import annotations

import gc
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SKIP: set[str] = set()


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    out_path = Path(
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_sf1_full.jsonl"
    )
    from diseasystore_spark.queries import QUERIES
    from diseasystore_spark.session import get_spark

    spark = get_spark("sweep_sf1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict] = {}
    with out_path.open("w") as fh:
        for sf_name, sf_dir in [
            ("sf0.1", "/root/testdata/sf0.1"),
            ("sf1", sf1_dir),
        ]:
            for name, fn in QUERIES.items():
                if name in SKIP:
                    continue
                t0 = time.perf_counter()
                rec: dict = {"query": name, "sf": sf_name}
                try:
                    df = fn(spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    rec["sec"] = round(time.perf_counter() - t0, 3)
                    del df
                except Exception as exc:  # keep sweeping
                    rec["sec"] = round(time.perf_counter() - t0, 3)
                    rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
                    traceback.print_exc(file=sys.stderr)
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
                results.setdefault(name, {})[sf_name] = rec.get(
                    "sec" if "error" not in rec else "error"
                )
                print(f"# {sf_name} {name}: {rec}", file=sys.stderr)
                gc.collect()
                spark.sparkContext._jvm.System.gc()

    ratios = {}
    for q, r in results.items():
        a, b = r.get("sf0.1"), r.get("sf1")
        if isinstance(a, float) and isinstance(b, float) and a > 0:
            ratios[q] = round(b / a, 2)
    flagged = {
        q: v for q, v in sorted(ratios.items(), key=lambda kv: -kv[1])
        if v > 10
    }
    print(
        json.dumps(
            {
                "n": len(results),
                "ratios": ratios,
                "flagged_over_10x": flagged,
            }
        )
    )


if __name__ == "__main__":
    main()
