"""Profile the scaled-conformance bench workload (VERDICT r9 item 6).

Runs exactly ``bench.py``'s ``_conformance_workload`` — the Google
COVID-19 store at 4x fixture scale through the full exported
conformance suite — but with (a) per-phase wall time from
``run_conformance_suite(timings=...)`` and (b) within-phase
attribution accumulators wrapped around the store's hot methods:

- ``update_snapshot``       SCD2 merge churn (per-range commits)
- ``_sorted_checksums``     golden-equality collect+hash validation
- ``read_csv_source``       raw CSV source reads (the store recomputes
                            the reference frame per golden check)

Emits one JSON line. Usage::

    python scripts/profile_conformance.py [scale]
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


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from diseasystore_spark import testing as testing_mod
    from diseasystore_spark.session import get_spark
    from diseasystore_spark.storage import scd2 as scd2_mod
    from diseasystore_spark.stores import google_covid19 as google_mod
    from diseasystore_spark.stores.google_covid19 import (
        GoogleCovid19Diseasystore,
    )
    from diseasystore_spark.testing import run_conformance_suite
    from tests.store_fixtures import write_google_fixtures

    spark = get_spark("profile-conformance")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    acc: dict[str, list[float]] = {}

    def wrap(obj, name, label):
        orig = getattr(obj, name)
        acc[label] = [0.0, 0]

        def timed(*a, **kw):
            t0 = time.perf_counter()
            try:
                return orig(*a, **kw)
            finally:
                acc[label][0] += time.perf_counter() - t0
                acc[label][1] += 1

        setattr(obj, name, timed)

    wrap(scd2_mod.ParquetFeatureStore, "update_snapshot", "scd2_merge")
    wrap(testing_mod, "_sorted_checksums", "checksum_validation")
    # google_covid19 binds read_csv_source into its own namespace —
    # patch THAT reference so the store's source reads are counted
    wrap(google_mod, "read_csv_source", "csv_source_read")

    root = tempfile.mkdtemp(prefix="profile_conf_")
    out: dict[str, object] = {"scale": scale}
    try:
        src = write_google_fixtures(
            os.path.join(root, "src"), gzip_by_age=True, scale=scale
        )
        ds = GoogleCovid19Diseasystore(
            spark,
            target_conn=os.path.join(root, "store"),
            source_conn=src,
            slice_ts=datetime.date(2024, 1, 1),
            verbose=False,
        )
        phases: dict[str, float] = {}
        t0 = time.perf_counter()
        run_conformance_suite(
            ds,
            test_start_date=datetime.date(2020, 3, 2),
            timings=phases,
        )
        out["total_s"] = round(time.perf_counter() - t0, 3)
        out["phases"] = phases
        out["attribution"] = {
            k: {"total_s": round(v[0], 3), "calls": v[1]}
            for k, v in acc.items()
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
