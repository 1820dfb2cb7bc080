"""LOCF gap fill and MAD outlier flagging (operators/impute.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

D = datetime.date


def test_locf_fill_carries_and_flags(spark):
    """Dense per-key spine, carried values, imputed flags; keys keep
    their own ranges; NULL dates dropped; duplicates raise loud."""
    from diseasystore_spark.operators.impute import locf_fill

    rows = [
        ("a", D(2024, 1, 1), 10),
        ("a", D(2024, 1, 4), 40),   # 2 gap days carried at 10
        ("a", D(2024, 1, 5), None),  # observed day, NULL value: the
        # VALUE is carried, so the row is flagged imputed=True
        ("b", D(2024, 2, 1), 7),    # separate key, separate range
        ("c", None, 99),            # NULL date: dropped
    ]
    df = spark.createDataFrame(rows, "k string, d date, v int")
    got = {
        (r["k"], r["d"]): (r["v"], r["imputed"])
        for r in locf_fill(df, ["k"], "d", "v").collect()
    }
    assert got == {
        ("a", D(2024, 1, 1)): (10, False),
        ("a", D(2024, 1, 2)): (10, True),
        ("a", D(2024, 1, 3)): (10, True),
        ("a", D(2024, 1, 4)): (40, False),
        ("a", D(2024, 1, 5)): (40, True),  # carried over the NULL
        ("b", D(2024, 2, 1)): (7, False),
    }

    dup = spark.createDataFrame(
        [("a", D(2024, 1, 1), 1), ("a", D(2024, 1, 1), 2)],
        "k string, d date, v int",
    )
    with pytest.raises(Exception, match="duplicate"):
        locf_fill(dup, ["k"], "d", "v").collect()
    with pytest.raises(ValueError, match="key_cols"):
        locf_fill(df, [], "d", "v")


def test_mad_outliers_matches_python_oracle(spark):
    """Lower-median MAD against a Python replay; the 3*MAD rule as an
    integer cross-multiplication; MAD=0 degenerate group flags any
    deviation; NULL values pass through unflagged."""
    import random as _random

    from diseasystore_spark.operators.impute import mad_outliers

    rng = _random.Random(5)
    rows = [("g1", rng.randint(0, 1000)) for _ in range(101)]
    rows += [("g1", 1_000_000)]  # a planted monster
    rows += [("g2", 5) for _ in range(10)] + [("g2", 6)]  # MAD=0 group
    rows += [("g1", None)]
    df = spark.createDataFrame(rows, "g string, cents long")
    got = mad_outliers(df, ["g"], "cents").collect()

    def lower_median(vs):
        s = sorted(vs)
        return s[(len(s) - 1) // 2]

    by_g = {}
    for g, v in rows:
        if v is not None:
            by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        med = lower_median(vs)
        mad = lower_median([abs(v - med) for v in vs])
        for r in got:
            if r["g"] != g:
                continue
            assert r["group_median"] == med and r["mad"] == mad
            if r["cents"] is None:
                assert r["outlier"] is None
            else:
                want = abs(r["cents"] - med) * 1_000_000 > 3_000_000 * mad
                assert r["outlier"] == want, (g, r["cents"])
    # the monster is flagged; the MAD=0 group flags exactly its '6'
    flags = {(r["g"], r["cents"]): r["outlier"] for r in got}
    assert flags[("g1", 1_000_000)] is True
    assert flags[("g2", 6)] is True and flags[("g2", 5)] is False
    with pytest.raises(ValueError, match="group_cols"):
        mad_outliers(df, [], "cents")


def test_locf_fill_null_key_is_its_own_series(spark):
    from diseasystore_spark.operators.impute import locf_fill

    # A NULL key must keep its OBSERVED values (a plain equality
    # spine join would blank them and mark them imputed).
    df = spark.createDataFrame(
        [
            (None, datetime.date(2024, 1, 1), 100),
            (None, datetime.date(2024, 1, 3), 300),
            ("a", datetime.date(2024, 1, 1), 1),
        ],
        "k string, d date, v int",
    )
    out = {
        (r["k"], r["d"].isoformat()): (r["v"], r["imputed"])
        for r in locf_fill(df, ["k"], "d", "v").collect()
    }
    assert out[(None, "2024-01-01")] == (100, False)
    assert out[(None, "2024-01-02")] == (100, True)
    assert out[(None, "2024-01-03")] == (300, False)
    assert out[("a", "2024-01-01")] == (1, False)


def test_mad_outliers_null_group_gets_flags(spark):
    from diseasystore_spark.operators.impute import mad_outliers

    # The NULL stratum gets its own median/MAD and real flags.
    rows = [("g", c) for c in (1, 2, 3, 4, 5)] + [
        (None, 10),
        (None, 10),
        (None, 10),
        (None, 10_000),
    ]
    df = spark.createDataFrame(rows, "g string, cents long")
    got = {
        (r["g"], r["cents"]): (r["group_median"], r["mad"], r["outlier"])
        for r in mad_outliers(df, ["g"], "cents").collect()
    }
    # NULL group: lower median 10, MAD 0 -> any deviation flags.
    assert got[(None, 10)] == (10, 0, False)
    assert got[(None, 10_000)] == (10, 0, True)
    assert got[("g", 3)][2] is False
