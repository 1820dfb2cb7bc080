"""Render the full-registry sf0.1 -> sf1 table for SCALE.md from the
sweep JSONL (``scripts/sweep_sf1_full.py`` output).

Usage: python scripts/render_sf1_table.py /tmp/sweep_sf1_full.jsonl
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_sf1_full.jsonl"
    rows: dict[str, dict] = {}
    for line in open(path):
        rec = json.loads(line)
        rows.setdefault(rec["query"], {})[rec["sf"]] = rec.get(
            "sec"
        ) if "error" not in rec else f"ERR:{rec['error'][:60]}"

    def key(q: str) -> tuple:
        num = "".join(ch for ch in q.split("_")[0][1:] if ch.isdigit())
        return (int(num or 0), q)

    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    flagged = []
    for q in sorted(rows, key=key):
        a, b = rows[q].get("sf0.1"), rows[q].get("sf1")
        ratio = ""
        if isinstance(a, float) and isinstance(b, float) and a > 0:
            r = b / a
            ratio = f"{r:.2f}x"
            if r > 10:
                flagged.append((q, r, a, b))
        print(f"| {q} | {a} | {b} | {ratio} |")
    print()
    print("Flagged (> 10x for 10x data):")
    for q, r, a, b in sorted(flagged, key=lambda t: -t[1]):
        print(f"- {q}: {a} -> {b} s ({r:.1f}x)")


if __name__ == "__main__":
    main()
