"""Dump `.explain(formatted)` for every registry query — the plan
audit artifact behind SCALE.md's shuffle inventory. Usage:

    python scripts/dump_plans.py [sf_dir] [out_path] [query ...]

Writes one section per query with the formatted physical plan, plus a
one-line summary (exchanges / broadcasts / python-eval nodes / scans)
so regressions stand out in a diff.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plans.txt"
    only = set(sys.argv[3:])

    from diseasystore_spark.queries import QUERIES
    from diseasystore_spark.session import get_spark

    spark = get_spark("plan-dump", cpus=8)
    sections = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            import contextlib
            import io

            from diseasystore_spark.plans.lint import plan_summary

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            s = plan_summary(df)
        except Exception as e:  # noqa: BLE001 - audit tool, keep going
            sections.append(f"== {name} ==\nERROR: {e}\n")
            continue
        summary = " ".join(f"{k}={v}" for k, v in s.items())
        sections.append(f"== {name} ==  [{summary}]\n{plan}\n")
        print(f"# {name}: {summary}", file=sys.stderr)
    Path(out_path).write_text("\n".join(sections))
    print(f"wrote {out_path} ({len(sections)} plans)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
