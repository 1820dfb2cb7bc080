"""Physical-plan lint — the 100-TB plan-shape gate as a library API.

``tests/test_plans.py`` pins individual operators' plan shapes; this
module gives users (and CI) the same leverage over THEIR compositions:
summarize a DataFrame's executed plan and assert the properties that
decide whether it survives a 1000-executor scale-up — no cartesian
products, no row-at-a-time Python in the row path, no unpartitioned
window over unbounded data.

The checks read Spark's formatted/compiled plan text, the same
evidence a human reads from ``df.explain("formatted")``. Node names
(``CartesianProduct``, ``BatchEvalPython``, ``WindowExec``) are part
of Spark's user-facing explain output and stable across the 3.x/4.x
line; detection is substring-based by design so the lint never blocks
on plan-format drift (an unknown node simply isn't flagged).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame


def plan_summary(df: DataFrame) -> dict:
    """Count the scale-relevant node families in ``df``'s physical
    plan. Keys:

    - ``exchanges``: shuffle boundaries (each is a full network
      redistribution of its input at scale);
    - ``broadcasts``: broadcast exchanges/joins (the cheap join shape
      for dimension-sized sides);
    - ``arrow_python``: Arrow-batched Python nodes (``MapInPandas`` /
      ``FlatMapGroupsInPandas`` / ``ArrowEvalPython`` — the acceptable
      Python boundary);
    - ``row_python``: row-at-a-time ``BatchEvalPython`` nodes (the
      10-100x-slow path — should be zero);
    - ``cartesian``: cartesian products (quadratic — should be zero);
    - ``scans``: file scans;
    - ``unpartitioned_windows``: window operators whose partition spec
      is empty — every input row lands in ONE task. Legitimate only
      over provably bounded frames (a top-k bucket table, a
      num-buckets histogram), so the count is reported, not judged.
    """
    # Count from the compiled plan's tree string: each physical node
    # prints exactly once there (the formatted explain repeats node
    # names in its details section, which double-counts). After an
    # action has run, AdaptiveSparkPlan.toString appends the
    # pre-reoptimization tree under "== Initial Plan ==" — cut it off
    # or every node in an executed query counts twice.
    simple = df._jdf.queryExecution().executedPlan().toString()
    cut = simple.find("== Initial Plan ==")
    if cut != -1:
        simple = simple[:cut]
    unpart = 0
    for line in simple.splitlines():
        s = line.strip().lstrip(":+-*( ").rstrip()
        if s.startswith("Window ") or s.startswith("RunningWindowFunction"):
            # Window nodes print as "Window [exprs], [part], [order]".
            # Both the partition and order groups are OPTIONAL, so a
            # single trailing group is ambiguous by count alone:
            # "Window [...], [o ASC NULLS FIRST]"  = unpartitioned,
            # "Window [...], [p]"                  = partitioned but
            # unordered (e.g. a per-group unbounded sum). Disambiguate
            # by content — Spark always renders order entries with an
            # "ASC|DESC NULLS FIRST|LAST" suffix, which a partition
            # expression never carries.
            groups = s.count("], [")
            if groups == 0:
                unpart += 1  # no partition, no order: global frame
            elif groups == 1:
                last = s.rsplit("], [", 1)[-1]
                if _re.search(r"(ASC|DESC) NULLS (FIRST|LAST)", last):
                    unpart += 1  # lone group is an ORDER spec
    return {
        "exchanges": simple.count("Exchange"),
        "broadcasts": simple.count("Broadcast"),
        "arrow_python": (
            simple.count("MapInPandas")
            + simple.count("FlatMapGroupsInPandas")
            + simple.count("ArrowEvalPython")
        ),
        "row_python": simple.count("BatchEvalPython"),
        "cartesian": simple.count("CartesianProduct"),
        "scans": simple.count("FileScan"),
        "unpartitioned_windows": unpart,
        # fail-closed density guards (contact_pairs blind mode) ride
        # as a broadcast subtree projecting the __dg_ok flag: fine in
        # user plans, but a registry entry carrying one means a
        # benchmark is silently paying the probe — tests pin this to
        # zero across the registry. (raise_error alone is NOT the
        # marker: stats/impute/classifier use it as deliberate
        # fail-loud data-quality gates.)
        "plan_guards": int("__dg_ok" in simple),
    }


def assert_distributed(
    df: DataFrame,
    max_unpartitioned_windows: int = 0,
    allow_row_python: bool = False,
) -> dict:
    """Raise ``AssertionError`` if ``df``'s plan contains a shape that
    does not survive scale-up: a cartesian product, a row-at-a-time
    Python eval (unless ``allow_row_python``), or more than
    ``max_unpartitioned_windows`` windows with an empty partition spec
    (raise the cap only for provably bounded frames). Returns the
    :func:`plan_summary` dict on success so callers can log it or pin
    exact counts in regression tests.
    """
    s = plan_summary(df)
    problems = []
    if s["cartesian"]:
        problems.append(f"{s['cartesian']} cartesian product(s)")
    if s["row_python"] and not allow_row_python:
        problems.append(
            f"{s['row_python']} row-at-a-time BatchEvalPython node(s)"
        )
    if s["unpartitioned_windows"] > max_unpartitioned_windows:
        problems.append(
            f"{s['unpartitioned_windows']} unpartitioned window(s) "
            f"(cap {max_unpartitioned_windows})"
        )
    if problems:
        raise AssertionError(
            "plan is not scale-safe: " + "; ".join(problems)
        )
    return s
