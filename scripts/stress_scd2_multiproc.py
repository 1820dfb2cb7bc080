"""Multi-PROCESS SCD2 commit stress (VERDICT r8 item 3).

The thread-based concurrency suite (``tests/test_scd2_concurrency.py``)
exercises the conditional-put protocol inside ONE JVM; the protocol's
actual claim is object-store safety across INDEPENDENT writers — no
shared locks, no shared SparkContext, nothing but the commit markers
on storage. This script drives N separate Python processes, each with
its OWN SparkSession (separate JVM), through concurrent
``update_snapshot`` calls against one store root
(``LocalCommitBackend``: ``os.link`` conditional put), barrier-started
so the first commits race the table-creation path itself.

Invariants checked by the driver (and by
``tests/test_scd2_multiprocess.py``, which spawns workers the same
way):

- **lost-update freedom**: every worker's every row is present and
  open in the final snapshot (commits are append-only on disjoint
  keys, so the merges commute — a lost update would surface as a
  missing key), and the final version number equals the TOTAL number
  of commits (every commit landed as its own immutable version;
  nobody overwrote anybody).
- **conflict-retry behavior**: losers observe
  ``CommitConflictError`` internally and their automatic retry lands
  on top of the winner (workers report how many conflicts they hit;
  the barrier start makes ≥1 across the fleet effectively certain).
- **no torn reads**: after the race, every intermediate slice_ts
  snapshot is readable and internally consistent.

Usage::

    python scripts/stress_scd2_multiproc.py            # driver: 3x4
    python scripts/stress_scd2_multiproc.py N K        # N workers x K
    python scripts/stress_scd2_multiproc.py worker ROOT WID K BARRIER FLEET
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _slice_ts(wid: int, j: int) -> datetime.datetime:
    # distinct per (worker, commit); ordering across processes is
    # whatever the race produces — per-slice_ts snapshot isolation
    # makes any arrival order legal
    return datetime.datetime(2024, 1, 1 + j, wid)


def worker(
    root: str, wid: int, n_commits: int, barrier: str, fleet_commits: int
) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName(f"scd2-mp-w{wid}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from diseasystore_spark.storage.scd2 import (
        CommitConflictError,
        ParquetFeatureStore,
    )

    # Count the conflicts this process LOSES (and then retries):
    # observable evidence that the race was real, reported on stdout.
    conflicts = {"n": 0}
    orig = ParquetFeatureStore._update_snapshot_attempt

    def counting(self, *a, **k):
        try:
            return orig(self, *a, **k)
        except CommitConflictError:
            conflicts["n"] += 1
            raise

    ParquetFeatureStore._update_snapshot_attempt = counting
    store = ParquetFeatureStore(spark, root)
    # The retry bound's contract is "N retries tolerate N concurrent
    # winners" (scd2.py). The default 5 is sized for incidental
    # overlap; this stress runs SUSTAINED contention where a slow
    # loser can legitimately see every other commit in the fleet win
    # before its own lands — observed in the first run of this script:
    # a worker lost 5 straight rounds to the other two and hit the
    # bounded-retry fail-loud path (itself correct behavior). A
    # production writer pool sizes the bound to its outstanding-commit
    # budget; each retry round has exactly one global winner, so any
    # bound >= the fleet's total commits terminates.
    store._COMMIT_RETRIES = fleet_commits + 5

    # Announce readiness (JVM fully up), then spin on the barrier so
    # every process fires its first commit at the same instant — the
    # worst case: N writers racing the CREATE of version 1.
    Path(f"{barrier}.ready.{wid}").touch()
    while not os.path.exists(barrier):
        time.sleep(0.02)

    for j in range(n_commits):
        df = spark.createDataFrame(
            [(f"w{wid}k{j}", float(j))], "key_id string, v double"
        )
        # append-only merge on disjoint keys: commutative, so the
        # final state is interleaving-independent and fully checkable
        store.update_snapshot(
            df, "ds.t", _slice_ts(wid, j), close_absent=False
        )
    print(
        json.dumps(
            {"worker": wid, "commits": n_commits, "conflicts": conflicts["n"]}
        )
    )
    spark.stop()


def spawn_workers(
    root: str, n_workers: int, n_commits: int
) -> list[dict]:
    """Spawn N worker processes against ``root``, barrier-start them,
    and return their parsed reports. Raises on any worker failure."""
    barrier = os.path.join(root, "__barrier__")
    env = dict(os.environ, PYTHONPATH=str(REPO))
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(Path(__file__).resolve()),
                "worker",
                root,
                str(w),
                str(n_commits),
                barrier,
                str(n_workers * n_commits),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=str(REPO),
            text=True,
        )
        for w in range(n_workers)
    ]
    deadline = time.time() + 180
    while time.time() < deadline:
        if all(
            os.path.exists(f"{barrier}.ready.{w}") for w in range(n_workers)
        ):
            break
        if any(p.poll() is not None for p in procs):
            break  # a worker died before readiness; surface below
        time.sleep(0.1)
    Path(barrier).touch()

    reports = []
    for w, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(
                f"worker {w} failed rc={p.returncode}\n{err[-4000:]}"
            )
        reports.append(json.loads(out.strip().splitlines()[-1]))
    return reports


def verify(root: str, n_workers: int, n_commits: int) -> dict:
    """Open the raced store read-only and check the invariants."""
    from diseasystore_spark.session import get_spark
    from diseasystore_spark.storage.scd2 import ParquetFeatureStore

    spark = get_spark("scd2-mp-verify")
    store = ParquetFeatureStore(spark, root)
    total = n_workers * n_commits
    version = store._current_version("ds.t")
    assert version == total, (
        f"lost update: {total} commits but version is {version}"
    )
    final = {
        r["key_id"]: r["v"]
        for r in store.get_table(
            "ds.t", datetime.datetime(2025, 1, 1)
        ).collect()
    }
    want = {
        f"w{w}k{j}": float(j)
        for w in range(n_workers)
        for j in range(n_commits)
    }
    assert final == want, (
        f"final snapshot wrong: missing={sorted(set(want) - set(final))[:5]}"
        f" extra={sorted(set(final) - set(want))[:5]}"
    )
    # every intermediate slice is readable (no torn state)
    for w in range(n_workers):
        for j in range(n_commits):
            snap = {
                r["key_id"]
                for r in store.get_table("ds.t", _slice_ts(w, j)).collect()
            }
            assert f"w{w}k{j}" in snap
    return {"version": version, "rows": len(final)}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        _, _, root, wid, k, barrier, fleet = sys.argv
        worker(root, int(wid), int(k), barrier, int(fleet))
        return
    n_workers = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    root = tempfile.mkdtemp(prefix="scd2_mp_")
    t0 = time.time()
    reports = spawn_workers(root, n_workers, n_commits)
    wall = time.time() - t0
    stats = verify(root, n_workers, n_commits)
    print(
        json.dumps(
            {
                "workers": reports,
                "total_conflicts": sum(r["conflicts"] for r in reports),
                "wall_s": round(wall, 1),
                **stats,
            }
        )
    )


if __name__ == "__main__":
    main()
