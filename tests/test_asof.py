"""asof_join: goldens, brute-force equivalence, DuckDB ASOF parity."""

from __future__ import annotations

import datetime
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diseasystore_spark.operators.asof import asof_join

TS = datetime.datetime


def _left(spark):
    return spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 10, 0), "a"),
            (1, TS(2024, 1, 1, 12, 0), "b"),
            (2, TS(2024, 1, 1, 11, 0), "c"),
            (3, TS(2024, 1, 1, 11, 0), "d"),  # key with no right rows
        ],
        "k long, ts timestamp, tag string",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 9, 0), 10.0),
            (1, TS(2024, 1, 1, 12, 0), 20.0),  # exact-match boundary
            (2, TS(2024, 1, 1, 11, 30), 30.0),  # after the left row
        ],
        "k long, ts timestamp, v double",
    )


def test_asof_golden(spark):
    out = {
        (r["k"], r["ts"]): (r["rts"], r["rv"])
        for r in asof_join(
            _left(spark), _right(spark), on="k", right_prefix="r",
            left_ts="ts", right_ts="ts",
        )
        .withColumnsRenamed({"rts": "rts", "rv": "rv"})
        .collect()
    }
    assert out[(1, TS(2024, 1, 1, 10, 0))] == (TS(2024, 1, 1, 9, 0), 10.0)
    # exact match allowed by default
    assert out[(1, TS(2024, 1, 1, 12, 0))] == (TS(2024, 1, 1, 12, 0), 20.0)
    # right row strictly after the left ts never matches
    assert out[(2, TS(2024, 1, 1, 11, 0))] == (None, None)
    assert out[(3, TS(2024, 1, 1, 11, 0))] == (None, None)


def test_asof_strict_and_inner_and_tolerance(spark):
    strict = {
        (r["k"], r["ts"]): r["rv"]
        for r in asof_join(
            _left(spark), _right(spark), on="k", right_prefix="r",
            allow_exact_matches=False,
        ).collect()
    }
    # boundary row now takes the *earlier* right row
    assert strict[(1, TS(2024, 1, 1, 12, 0))] == 10.0

    inner = asof_join(
        _left(spark), _right(spark), on="k", right_prefix="r", how="inner"
    )
    assert inner.count() == 2

    tol = {
        (r["k"], r["ts"]): r["rv"]
        for r in asof_join(
            _left(spark), _right(spark), on="k", right_prefix="r",
            tolerance_seconds=3600,
        ).collect()
    }
    # 10:00 - 09:00 = exactly the tolerance: kept
    assert tol[(1, TS(2024, 1, 1, 10, 0))] == 10.0


def test_asof_null_payload_row_integrity(spark):
    """A right row whose payload field is NULL must not be 'filled'
    from an older right row (struct packing, not per-column last)."""
    left = spark.createDataFrame(
        [(1, TS(2024, 1, 2))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 1), 5.0), (1, TS(2024, 1, 1, 2), None)],
        "k long, ts timestamp, v double",
    )
    row = asof_join(left, right, on="k", right_prefix="r").first()
    assert row["rts"] == TS(2024, 1, 1, 2) and row["rv"] is None


def test_asof_collision_errors(spark):
    with pytest.raises(ValueError, match="collide"):
        asof_join(_left(spark), _right(spark), on="k")


def test_asof_matches_bruteforce_and_duckdb(spark):
    """Randomized: union-trick output == per-row brute force == DuckDB
    native ASOF JOIN."""
    rng = random.Random(7)
    base = TS(2024, 1, 1)
    lrows = [
        (rng.randrange(8), base + datetime.timedelta(seconds=rng.randrange(5000)), i)
        for i in range(300)
    ]
    rrows = [
        (rng.randrange(8), base + datetime.timedelta(seconds=rng.randrange(5000)), float(i))
        for i in range(200)
    ]
    # unique (k, ts) on the right for a deterministic match
    seen = set()
    rrows = [r for r in rrows if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]
    left = spark.createDataFrame(lrows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, v double")

    got = {
        r["lid"]: (r["rts"], r["rv"])
        for r in asof_join(left, right, on="k", right_prefix="r").collect()
    }

    by_key: dict[int, list] = {}
    for k, ts, v in rrows:
        by_key.setdefault(k, []).append((ts, v))
    for rows in by_key.values():
        rows.sort()
    expected = {}
    for k, ts, lid in lrows:
        cand = [(t, v) for t, v in by_key.get(k, []) if t <= ts]
        expected[lid] = cand[-1] if cand else (None, None)
    assert got == expected

    duck = duckdb.connect()
    duck.register("l", pd.DataFrame(lrows, columns=["k", "ts", "lid"]))
    duck.register("r", pd.DataFrame(rrows, columns=["k", "ts", "v"]))
    ddf = duck.execute(
        "SELECT l.lid, r.ts AS rts, r.v AS rv FROM l "
        "ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"
    ).df()
    dmap = {
        int(row.lid): (
            None if pd.isna(row.rts) else row.rts.to_pydatetime(),
            None if pd.isna(row.rv) else row.rv,
        )
        for row in ddf.itertuples()
    }
    assert got == dmap


def test_point_in_time_features_leakage_and_namespacing(spark):
    """Strict mode never exposes same-instant feature rows (no label
    leakage); each feature table lands under its own prefix; missing
    history yields NULLs; duplicate/empty prefixes raise."""
    import datetime as dt

    import pytest

    from diseasystore_spark.operators.asof import point_in_time_features

    T = dt.datetime
    spine = spark.createDataFrame(
        [(1, T(2024, 1, 10), 100.0), (2, T(2024, 1, 5), 50.0)],
        "user_id bigint, ts timestamp, label double",
    )
    views = spark.createDataFrame(
        [
            (1, T(2024, 1, 9), 7.0),
            (1, T(2024, 1, 10), 99.0),   # same instant as the label!
            (2, T(2024, 1, 6), 3.0),     # after user 2's label
        ],
        "user_id bigint, ts timestamp, value double",
    )
    clicks = spark.createDataFrame(
        [(1, T(2024, 1, 1), 1.0)],
        "user_id bigint, ts timestamp, value double",
    )
    out = {
        r["user_id"]: r
        for r in point_in_time_features(
            spine,
            [
                {"df": views, "on": "user_id", "prefix": "v_"},
                {"df": clicks, "on": "user_id", "prefix": "c_"},
            ],
            allow_exact_matches=False,
        ).collect()
    }
    assert out[1]["v_value"] == 7.0  # the 99.0 at the label instant is unseen
    assert out[1]["v_ts"] == T(2024, 1, 9)
    assert out[1]["c_value"] == 1.0
    assert out[2]["v_value"] is None and out[2]["c_value"] is None
    assert out[1]["label"] == 100.0

    with pytest.raises(ValueError, match="non-empty prefix"):
        point_in_time_features(
            spine, [{"df": views, "on": "user_id", "prefix": ""}]
        )
    with pytest.raises(ValueError, match="duplicate"):
        point_in_time_features(
            spine,
            [
                {"df": views, "on": "user_id", "prefix": "v_"},
                {"df": clicks, "on": "user_id", "prefix": "v_"},
            ],
        )


def test_last_touch_attribution_shape(spark):
    """asof_join as an attribution engine: latest strictly-before
    touch inside the window wins, same-instant ties break by id, and
    out-of-window conversions stay unattributed."""
    import datetime as dt

    from pyspark.sql import functions as F

    from diseasystore_spark.operators.asof import asof_join

    T = dt.datetime
    conv = spark.createDataFrame(
        [
            (1, 100, T(2024, 1, 2, 12), 10.0),   # view@11 wins over click@10
            (1, 101, T(2024, 1, 5, 12), 20.0),   # >24h from any touch
            (2, 102, T(2024, 1, 2, 10), 30.0),   # tie at same ts: max id wins
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )
    touch = spark.createDataFrame(
        [
            (1, "click", T(2024, 1, 2, 10), 1),
            (1, "view", T(2024, 1, 2, 11), 2),
            (2, "click", T(2024, 1, 2, 9), 3),
            (2, "view", T(2024, 1, 2, 9), 4),
        ],
        "user_id long, touch_type string, ts timestamp, touch_id long",
    )
    att = asof_join(
        conv, touch, on="user_id", allow_exact_matches=False,
        tolerance_seconds=86400, right_prefix="t_", tiebreak=["touch_id"],
    )
    got = {
        r["event_id"]: r["t_touch_type"] for r in att.collect()
    }
    assert got == {100: "view", 101: None, 102: "view"}
