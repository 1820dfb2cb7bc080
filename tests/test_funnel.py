"""Funnel / cohort-retention operator semantics (operators/funnel).

Pins the deterministic conventions the DuckDB oracles (q187/q188)
replay: strict-after step ordering, the window anchored at the
EARLIEST step-1 event, stalled users carried with NULLs, floored
micro-unit rates, Monday-truncated weekly cohorts.
"""

from __future__ import annotations

import datetime

import pytest

from diseasystore_spark.operators.funnel import (
    cohort_retention,
    funnel_conversions,
    funnel_steps,
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(t), e) for (u, t, e) in rows],
        "user_id bigint, ts timestamp, event_type string",
    )


def test_funnel_strict_ordering_and_stalls(spark):
    ev = _events(
        spark,
        [
            # u1 completes in order.
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:05:00", "click"),
            (1, "2024-01-01 10:10:00", "buy"),
            # u2: click BEFORE the first view — does not count; no
            # later click, so u2 stalls at step 1.
            (2, "2024-01-01 09:00:00", "click"),
            (2, "2024-01-01 10:00:00", "view"),
            # u3: never viewed — not in the funnel at all.
            (3, "2024-01-01 10:00:00", "click"),
            (3, "2024-01-01 11:00:00", "buy"),
            # u4: click at the SAME instant as the view — strict
            # 'after' excludes it; a later click counts.
            (4, "2024-01-01 10:00:00", "view"),
            (4, "2024-01-01 10:00:00", "click"),
            (4, "2024-01-01 12:00:00", "click"),
        ],
    )
    out = {
        r["user_id"]: r
        for r in funnel_steps(
            ev, "user_id", "ts", "event_type", ["view", "click", "buy"]
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1]["t_2"] == _ts("2024-01-01 10:05:00")
    assert out[1]["t_3"] == _ts("2024-01-01 10:10:00")
    assert out[2]["t_2"] is None and out[2]["t_3"] is None
    assert out[4]["t_2"] == _ts("2024-01-01 12:00:00")


def test_funnel_window_anchored_at_first_step1(spark):
    # u1's first view is 09:00; the 1h window ends 10:00 even though
    # a second view at 11:00 would have a qualifying click — the
    # anchor is the EARLIEST step-1 event, by documented convention.
    ev = _events(
        spark,
        [
            (1, "2024-01-01 09:00:00", "view"),
            (1, "2024-01-01 11:00:00", "view"),
            (1, "2024-01-01 11:30:00", "click"),
            (2, "2024-01-01 09:00:00", "view"),
            (2, "2024-01-01 09:30:00", "click"),
        ],
    )
    out = {
        r["user_id"]: r
        for r in funnel_steps(
            ev,
            "user_id",
            "ts",
            "event_type",
            ["view", "click"],
            within_seconds=3600,
        ).collect()
    }
    assert out[1]["t_2"] is None
    assert out[2]["t_2"] == _ts("2024-01-01 09:30:00")


def test_funnel_conversions_floored_micro(spark):
    # 3 viewers, 2 click, 1 buys: 2/3 -> 666666 (floored), 1/2 ->
    # 500000 from prev, 1/3 -> 333333 from first.
    ev = _events(
        spark,
        [
            (1, "2024-01-01 10:00:00", "view"),
            (2, "2024-01-01 10:00:00", "view"),
            (3, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:01:00", "click"),
            (2, "2024-01-01 10:01:00", "click"),
            (1, "2024-01-01 10:02:00", "buy"),
        ],
    )
    rows = {
        r["step"]: r
        for r in funnel_conversions(
            ev, "user_id", "ts", "event_type", ["view", "click", "buy"]
        ).collect()
    }
    assert [rows[i]["n_users"] for i in (1, 2, 3)] == [3, 2, 1]
    assert rows[1]["conv_from_prev_micro"] == 1_000_000
    assert rows[2]["conv_from_first_micro"] == 666_666
    assert rows[2]["conv_from_prev_micro"] == 666_666
    assert rows[3]["conv_from_first_micro"] == 333_333
    assert rows[3]["conv_from_prev_micro"] == 500_000
    assert rows[2]["step_name"] == "click"


def test_funnel_rejects_bad_steps(spark):
    ev = _events(spark, [(1, "2024-01-01 10:00:00", "view")])
    with pytest.raises(ValueError):
        funnel_steps(ev, "user_id", "ts", "event_type", ["view"])
    with pytest.raises(ValueError):
        funnel_steps(ev, "user_id", "ts", "event_type", ["view", "view"])


def test_cohort_retention_weekly(spark):
    # Weeks: 2024-01-01 (Mon) and 2024-01-08. u1 first week 1,
    # active weeks 1 and 2; u2 first week 1 only; u3 first week 2.
    ev = _events(
        spark,
        [
            (1, "2024-01-02 10:00:00", "x"),
            (1, "2024-01-03 10:00:00", "x"),  # same week — distinct'd
            (1, "2024-01-09 10:00:00", "x"),
            (2, "2024-01-04 10:00:00", "x"),
            (3, "2024-01-10 10:00:00", "x"),
        ],
    )
    out = {
        (r["cohort_week"].isoformat(), r["week_offset"]): r
        for r in cohort_retention(ev, "user_id", "ts").collect()
    }
    w1, w2 = "2024-01-01", "2024-01-08"
    assert out[(w1, 0)]["n_active"] == 2
    assert out[(w1, 0)]["cohort_size"] == 2
    assert out[(w1, 0)]["retained_micro"] == 1_000_000
    assert out[(w1, 1)]["n_active"] == 1
    assert out[(w1, 1)]["retained_micro"] == 500_000
    assert out[(w2, 0)]["n_active"] == 1
    assert out[(w2, 0)]["cohort_size"] == 1
    assert set(out) == {(w1, 0), (w1, 1), (w2, 0)}


def test_cohort_retention_offset_cap_and_null_ts(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-02 10:00:00"), "x"),
            (1, _ts("2024-03-05 10:00:00"), "x"),  # offset 9
            (1, None, "x"),  # NULL ts dropped
        ],
        "user_id bigint, ts timestamp, event_type string",
    )
    out = cohort_retention(ev, "user_id", "ts", max_week_offset=4).collect()
    assert sorted(r["week_offset"] for r in out) == [0]
