"""Per-query, per-stage profiler: runs each named registry query with
the noop sink and prints its heaviest stages (task count, executor
run/CPU time, shuffle rows) from the UI REST API — the evidence that
locates single-task CPU-dense stages and per-iteration re-shuffles.

    python scripts/profile_stages.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]

    from diseasystore_spark.queries import QUERIES
    from diseasystore_spark.session import get_spark

    spark = get_spark("stage-profile", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Warm the Python worker pool the same way bench.py does (round
    # 11): fork+import of ~32 workers is session init, not query cost.
    from bench import _warm_python_workers

    _warm_python_workers(spark)

    app = json.load(
        urllib.request.urlopen("http://localhost:4040/api/v1/applications")
    )[0]["id"]
    base = f"http://localhost:4040/api/v1/applications/{app}"

    import gc

    for name in names:
        group = f"sp-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        tb = time.perf_counter() - t0
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts = time.perf_counter() - t1
        st = sc.statusTracker()
        stage_ids = set()
        for jid in st.getJobIdsForGroup(group):
            ji = st.getJobInfo(jid)
            if ji:
                stage_ids.update(ji.stageIds)
        sc.setJobGroup(None, None)
        stages = json.load(
            urllib.request.urlopen(f"{base}/stages?status=complete")
        )
        mine = [s for s in stages if s["stageId"] in stage_ids]
        mine.sort(key=lambda s: -s["executorRunTime"])
        print(
            f"## {name}: build={tb:.2f} sink={ts:.2f} "
            f"stages={len(mine)} "
            f"exec_total={sum(s['executorRunTime'] for s in mine)/1e3:.1f}s",
            flush=True,
        )
        for s in mine[:6]:
            print(
                f"   stage={s['stageId']:4d} tasks={s['numCompleteTasks']:4d} "
                f"run={s['executorRunTime']/1e3:7.2f}s "
                f"cpu={s.get('executorCpuTime', 0)/1e9:7.2f}s "
                f"shRows={s.get('shuffleReadRecords', 0):9d} "
                f"inRows={s.get('inputRecords', 0):9d}",
                flush=True,
            )
        del df
        gc.collect()
        sc._jvm.System.gc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
