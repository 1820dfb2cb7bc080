"""Skyline operator vs a brute-force Python oracle, including
partition-invariance (the two-phase merge must not lose points)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from diseasystore_spark.operators.skyline import skyline


def py_skyline(rows, signs):
    def dominated(a, b):  # b dominates a?
        ge = all(sb * vb >= sa * va for (va, vb, sa, sb) in
                 ((a[i], b[i], signs[i], signs[i]) for i in range(len(signs))))
        gt = any(signs[i] * b[i] > signs[i] * a[i] for i in range(len(signs)))
        return ge and gt

    return sorted(
        r for r in rows if not any(dominated(r, o) for o in rows if o != r)
    )


def test_skyline_golden_and_duplicates(spark):
    rows = [
        (1, 5.0, 5.0),
        (2, 5.0, 5.0),   # duplicate of the skyline point: both kept
        (3, 4.0, 6.0),
        (4, 4.0, 4.0),   # dominated by 1
        (5, 6.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = sorted(r["id"] for r in skyline(df, {"x": "max", "y": "max"}).collect())
    assert got == [1, 2, 3, 5]
    # min direction flips dominance: (4,4) now dominates (5,5) twice
    # over AND (4,6); only (6,1) survives alongside it
    got_min = sorted(
        r["id"] for r in skyline(df, {"x": "min", "y": "min"}).collect()
    )
    assert got_min == [4, 5]


def test_skyline_validates(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, x double")
    with pytest.raises(ValueError, match="at least one"):
        skyline(df, {})
    with pytest.raises(ValueError, match="max.*min|'max' or 'min'"):
        skyline(df, {"x": "up"})
    with pytest.raises(ValueError, match="not in frame"):
        skyline(df, {"nope": "max"})


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=30,
    ),
    st.tuples(st.sampled_from([1, -1]), st.sampled_from([1, -1]),
              st.sampled_from([1, -1])),
)
def test_skyline_matches_python_any_partitioning(spark, pts, sgn):
    rows = [(i, float(a), float(b), float(c)) for i, (a, b, c) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "id long, x double, y double, z double"
    ).repartition(5)  # force multi-partition two-phase merge
    dims = {
        "x": "max" if sgn[0] == 1 else "min",
        "y": "max" if sgn[1] == 1 else "min",
        "z": "max" if sgn[2] == 1 else "min",
    }
    got = sorted(
        (r["x"], r["y"], r["z"]) for r in skyline(df, dims).collect()
    )
    want = py_skyline([(a, b, c) for _, a, b, c in rows], list(sgn))
    assert got == want


def test_skyline_rejects_null_dimensions(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 3.0), (2, None, 1.0)], "id long, x double, y double"
    )
    with pytest.raises(Exception, match="non-null"):
        skyline(df, {"x": "max", "y": "max"}).collect()


def test_skyline_timestamp_dimension(spark):
    import datetime as dt

    T = dt.datetime
    df = spark.createDataFrame(
        [
            (1, 10.0, T(2024, 1, 5)),
            (2, 10.0, T(2024, 1, 9)),   # dominates 1 on ts, ties price
            (3, 5.0, T(2024, 1, 1)),    # dominated by both
            (4, 12.0, T(2024, 1, 2)),
        ],
        "id long, price double, ts timestamp",
    )
    got = sorted(
        r["id"]
        for r in skyline(df, {"price": "max", "ts": "max"}).collect()
    )
    assert got == [2, 4]


def test_skyline_anticorrelated_stress_tree_merge(spark):
    """Adversarial anti-correlated data: EVERY point is on a local
    Pareto front somewhere (x + y == const plus jitter rows that are
    dominated), so the candidate union is large relative to the true
    skyline. The tree merge must still produce exactly the
    brute-force skyline regardless of partitioning."""
    import random

    rng = random.Random(7)
    rows = []
    # 400 anti-correlated skyline points (x + y = 1000, all mutually
    # non-dominating) + 1600 dominated jitter points
    for i in range(400):
        x = float(i)
        rows.append((i, x, 1000.0 - x))
    for i in range(400, 2000):
        x = rng.uniform(0, 399)
        rows.append((i, x, 1000.0 - x - rng.uniform(1.0, 50.0)))
    df = spark.createDataFrame(
        rows, "id long, x double, y double"
    ).repartition(32)
    got = sorted(
        r["id"] for r in skyline(df, {"x": "max", "y": "max"}).collect()
    )
    want = sorted(
        i for (i, x, y) in rows
        if not any(
            (ox >= x and oy >= y and (ox > x or oy > y))
            for (_, ox, oy) in rows
        )
    )
    assert got == want
    assert len(want) == 400  # the full anti-correlated front survives


def test_skyline_rejects_null_timestamp_dimension(spark):
    """NaT in a timestamp dimension must fail loud, not silently
    become int64 min and corrupt dominance under a 'min' direction."""
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0), (2, None, 2.0)],
        "id long, ts timestamp, v double",
    )
    with pytest.raises(Exception, match="non-null"):
        skyline(df, {"ts": "min", "v": "max"}).collect()


def test_skyline_merge_rounds_are_stage_barriers(spark):
    """The tree merge must use shuffle barriers, not narrow coalesce:
    a trailing coalesce(1) FUSES the whole chain — including the
    supposedly-parallel local-skyline pass — into one task (measured
    on q76: the entire operator ran single-task). Pin the shape: the
    operator adds no Coalesce node, and there is one Exchange per
    merge round plus the spread of the single-partition input, so the
    local pass keeps the scan/spread width."""
    from diseasystore_spark.plans.lint import plan_summary

    df = (
        spark.range(4000)
        .selectExpr(
            "id",
            "cast(id % 97 as double) as x",
            "cast((id * 31) % 89 as double) as y",
        )
        .coalesce(1)  # simulate the one-file scan
    )
    out = skyline(df, {"x": "max", "y": "max"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only Coalesce allowed is the test's own input coalesce(1)
    assert plan.count("Coalesce") <= 1
    rounds, t = 0, max(2, spark.sparkContext.defaultParallelism)
    while t > 1:
        t = max(1, t // 8)
        rounds += 1
    assert plan_summary(out)["exchanges"] >= rounds + 1
