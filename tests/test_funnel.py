"""Conversion-window funnels and rate rollups (operators/events).

test_events.py pins the base state machine; these pin the round-8
extensions the q187/q188 oracles replay: the ``within_seconds``
window anchored at the EARLIEST first-stage event (both funnel
variants), floored micro-unit conversion rates, and the retention
triangle's ``with_rates`` columns.
"""

from __future__ import annotations

import datetime

import pytest

from diseasystore_spark.operators.events import (
    funnel_conversions,
    funnel_reach,
    funnel_reach_joins,
    retention_cohorts,
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def _us(s: str) -> int:
    return int(
        _ts(s).replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    )


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(t), e) for (u, t, e) in rows],
        "user_id bigint, ts timestamp, event_type string",
    )


@pytest.mark.parametrize("reach_fn", [funnel_reach, funnel_reach_joins])
def test_window_anchored_at_first_stage0(spark, reach_fn):
    # u1's first view is 09:00; the 1h window ends 10:00 even though
    # a second view at 11:00 would have a qualifying click — the
    # anchor is the EARLIEST first-stage event, by documented
    # convention (no alternative-anchor search).
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
        r["user_id"]: r["reach"]
        for r in reach_fn(
            ev, ["view", "click"], within_seconds=3600
        ).collect()
    }
    assert out[1] == [_us("2024-01-01 09:00:00"), None]
    assert out[2] == [
        _us("2024-01-01 09:00:00"),
        _us("2024-01-01 09:30:00"),
    ]


@pytest.mark.parametrize("reach_fn", [funnel_reach, funnel_reach_joins])
def test_window_boundary_inclusive_and_chains(spark, reach_fn):
    # Exactly AT t0 + window counts (<=); one microsecond past does
    # not. Later stages measure against t0, not the previous stage.
    ev = _events(
        spark,
        [
            (1, "2024-01-01 09:00:00", "a"),
            (1, "2024-01-01 09:30:00", "b"),
            (1, "2024-01-01 10:00:00", "c"),  # == t0 + 3600s: in
            (2, "2024-01-01 09:00:00", "a"),
            (2, "2024-01-01 09:30:00", "b"),
            (2, "2024-01-01 10:00:00.000001", "c"),  # 1us past: out
        ],
    )
    out = {
        r["user_id"]: r["reach"]
        for r in reach_fn(
            ev, ["a", "b", "c"], within_seconds=3600
        ).collect()
    }
    assert out[1][2] == _us("2024-01-01 10:00:00")
    assert out[2][2] is None


def test_funnel_conversions_floored_micro(spark):
    # 3 viewers, 2 click, 1 buys: 666666 / 500000 / 333333 floored.
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
    for skew_safe in (False, True):
        rows = {
            r["step"]: r
            for r in funnel_conversions(
                ev, ["view", "click", "buy"], skew_safe=skew_safe
            ).collect()
        }
        assert [rows[i]["n_users"] for i in (1, 2, 3)] == [3, 2, 1]
        assert rows[1]["conv_from_prev_micro"] == 1_000_000
        assert rows[2]["conv_from_first_micro"] == 666_666
        assert rows[2]["conv_from_prev_micro"] == 666_666
        assert rows[3]["conv_from_first_micro"] == 333_333
        assert rows[3]["conv_from_prev_micro"] == 500_000
        assert rows[2]["step_name"] == "click"


def test_funnel_conversions_empty_funnel(spark):
    ev = _events(spark, [(1, "2024-01-01 10:00:00", "other")])
    rows = funnel_conversions(ev, ["view", "click"]).collect()
    assert [(r["n_users"], r["conv_from_prev_micro"]) for r in rows] == [
        (0, 0),
        (0, 0),
    ]


def test_retention_with_rates(spark):
    # Weeks 2024-01-01 / 2024-01-08. u1,u2 cohort week 1; u1 returns
    # week 2; u3 cohort week 2.
    ev = _events(
        spark,
        [
            (1, "2024-01-02 10:00:00", "x"),
            (1, "2024-01-09 10:00:00", "x"),
            (2, "2024-01-04 10:00:00", "x"),
            (3, "2024-01-10 10:00:00", "x"),
        ],
    )
    out = {
        (r["cohort"].isoformat(), r["period_offset"]): r
        for r in retention_cohorts(ev, with_rates=True).collect()
    }
    w1, w2 = "2024-01-01", "2024-01-08"
    assert out[(w1, 0)]["cohort_size"] == 2
    assert out[(w1, 0)]["retained_micro"] == 1_000_000
    assert out[(w1, 1)]["active_users"] == 1
    assert out[(w1, 1)]["retained_micro"] == 500_000
    assert out[(w2, 0)]["cohort_size"] == 1
    assert set(out) == {(w1, 0), (w1, 1), (w2, 0)}


# ---------------------------------------------------------------------------
# Property: windowed funnel == Python oracle, both variants agree
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_STAGES = ["a", "b", "c"]
_ev_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=120),  # second offset
        st.sampled_from(["a", "b", "c", "noise"]),
    ),
    min_size=1,
    max_size=30,
)


def _py_windowed_reach(rows, stages, within_s):
    """Sequential min-after chain with a t0-anchored window — the
    q187 oracle's formulation, independent of the scan order the
    state machine uses."""
    out = {}
    for u in {r[0] for r in rows}:
        evs = [
            (t, s) for (uu, t, s) in rows if uu == u and s in stages
        ]
        if not evs:
            continue  # no stage-typed event: not in the frame at all
        reach = [None] * len(stages)
        cand = [t for (t, s) in evs if s == stages[0]]
        if cand:
            reach[0] = min(cand)
            hi = None if within_s is None else reach[0] + within_s
            for j in range(1, len(stages)):
                if reach[j - 1] is None:
                    break
                cand = [
                    t
                    for (t, s) in evs
                    if s == stages[j]
                    and t > reach[j - 1]
                    and (hi is None or t <= hi)
                ]
                reach[j] = min(cand) if cand else None
        # a user with SOME stage event but no stage-0 event appears
        # with an all-NULL reach (both operator variants agree).
        out[u] = reach
    return out


@settings(max_examples=12, deadline=None)
@given(_ev_strategy, st.sampled_from([None, 10, 45]))
def test_windowed_funnel_matches_python_oracle(spark, events, within):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=t), s) for (u, t, s) in events],
        "user_id int, ts timestamp, event_type string",
    )
    base_us = int(
        base.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    want = {
        u: [None if t is None else base_us + t * 1_000_000 for t in reach]
        for u, reach in _py_windowed_reach(
            events, _STAGES, within
        ).items()
    }
    a = {
        r["user_id"]: r["reach"]
        for r in funnel_reach(
            df, _STAGES, within_seconds=within
        ).collect()
    }
    b = {
        r["user_id"]: r["reach"]
        for r in funnel_reach_joins(
            df, _STAGES, within_seconds=within
        ).collect()
    }
    assert a == want
    assert b == want


@pytest.mark.parametrize("reach_fn", [funnel_reach, funnel_reach_joins])
def test_nonpositive_window_rejected(spark, reach_fn):
    ev = _events(spark, [(1, "2024-01-01 10:00:00", "a")])
    for bad in (0, -5):
        with pytest.raises(ValueError):
            reach_fn(ev, ["a", "b"], within_seconds=bad)
