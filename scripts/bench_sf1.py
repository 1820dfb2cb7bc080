"""Scaling study: run the most expensive registry queries + the
baseline workloads at sf0.1 AND the generated sf1 (scripts/
make_sf1.py) in one warmed session, and print a JSON comparison —
evidence for SCALE.md's sublinear-write-path claim.

Usage: python scripts/bench_sf1.py [sf1_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

QUERIES = [
    "q01_prevalence_total",
    "q24_simhash",
    "q31_snapshot_isolation",
    "q37_dedup_components",
    "q46_ann_ivf_fixed",
    "q47_curation",
    # round-3 continuation additions
    "q55_dedup_lines",
    "q58_importance_weights",
    "q59_near_dup_groups_minhash",
    "q61_ngram_decontaminate",
    # round-3 session additions
    "q66_curation_e2e",
    "q68_funnel",
    "q70_knn_classify",
    "q71_build_mixture",
    "q73_canonical_by_quality",
    "q75_epoch_shuffle",
    "q76_skyline",
    "q77_journey_similarity",
    "q80_contamination_spans",
    # round-5 third-block additions
    "q111_pagerank_parts",
    "q112_semantic_dedup",
    "q113_rrf_fusion",
    "q114_duplicate_spans",
    # round-8 continuation additions
    "q187_funnel_conversions",
    "q188_cohort_retention",
    "q189_orc_roundtrip",
    "q190_reading_ease",
]


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    from bench import _baseline_workloads
    from diseasystore_spark.queries import QUERIES as ALL
    from diseasystore_spark.session import get_spark

    spark = get_spark("bench_sf1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import gc

    out: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)]:
        for name in QUERIES:
            t0 = time.perf_counter()
            n = ALL[name](spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            out.setdefault(name, {})[sf_name] = dt
            out[name][f"{sf_name}_rows"] = n
            print(f"# {sf_name} {name}: {n} rows in {dt:.3f}s", file=sys.stderr)
            # release localCheckpoint blocks between timings (see
            # bench.py): without this, late queries in the sequence
            # measure accumulated block-manager pressure, not plans
            gc.collect()
            spark.sparkContext._jvm.System.gc()

    base = _baseline_workloads(spark)
    for k, v in base.items():
        out[k] = {"fixed_size": v}

    ratios = {
        q: round(out[q]["sf1"] / out[q]["sf0.1"], 2)
        for q in QUERIES
        if out[q]["sf0.1"] > 0
    }
    print(json.dumps({"timings": out, "sf1_over_sf01_ratio": ratios}))


if __name__ == "__main__":
    main()
