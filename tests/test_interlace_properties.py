"""Property-based testing of interlace against an obviously-correct
pure-Python oracle (random interval tables via hypothesis)."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from diseasystore_spark.operators.interlace import interlace

D0 = datetime.date(2020, 1, 1)


def py_interlace(tables: list[list[tuple]], n_payloads: list[int]):
    """Pure-Python reference: per key, split the timeline at every
    breakpoint from any table, emit one row per (key, sub-interval)
    carrying each table's payload valid in that sub-interval.
    Rows: (key, payload, valid_from, valid_until) with valid_until None
    for open intervals."""
    keys = {r[0] for t in tables for r in t}
    out = []
    for key in keys:
        points = set()
        for t in tables:
            for r in t:
                if r[0] != key:
                    continue
                points.add(r[2])
                if r[3] is not None:
                    points.add(r[3])
        spine = sorted(points)
        intervals = [
            (spine[i], spine[i + 1] if i + 1 < len(spine) else None)
            for i in range(len(spine))
        ]
        for vf, vu in intervals:
            row = [key]
            for t in tables:
                match = [
                    r
                    for r in t
                    if r[0] == key
                    and r[2] <= vf
                    and (r[3] is None or vf < r[3])
                ]
                # multiple matches multiply rows; our generator keeps
                # at most one valid row per (table, key, instant)
                row.append(match[0][1] if match else None)
            out.append((key, *row[1:], vf, vu))
    return sorted(out, key=lambda r: tuple((x is None, x) for x in r))


@st.composite
def interval_table(draw, key_pool, payload_base):
    """Rows with non-overlapping validity per key (feature-store shape)."""
    rows = []
    for key in key_pool:
        if not draw(st.booleans()):
            continue
        n_segments = draw(st.integers(1, 3))
        start = draw(st.integers(0, 10))
        cursor = start
        for seg in range(n_segments):
            length = draw(st.integers(1, 5))
            is_last = seg == n_segments - 1
            open_ended = is_last and draw(st.booleans())
            vf = D0 + datetime.timedelta(days=cursor)
            vu = None if open_ended else vf + datetime.timedelta(days=length)
            rows.append((key, float(payload_base + seg), vf, vu))
            if open_ended:
                break
            gap = draw(st.integers(0, 3))
            cursor += length + gap
    return rows


@st.composite
def tables_strategy(draw):
    keys = [f"k{i}" for i in range(draw(st.integers(1, 3)))]
    n_tables = draw(st.integers(2, 3))
    return [
        draw(interval_table(keys, 10 * (t + 1))) for t in range(n_tables)
    ]


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from diseasystore_spark.session import get_spark

        _spark = get_spark("interlace-props", cpus=4)
    return _spark


@settings(max_examples=12, deadline=None)
@given(tables_strategy())
def test_interlace_matches_python_oracle(tables):
    spark = _get_spark()
    if not any(tables):
        return
    n_tables = len(tables)
    sdfs = []
    for i, t in enumerate(tables):
        schema = f"key_k string, p{i} double, valid_from date, valid_until date"
        sdfs.append(
            spark.createDataFrame(t or [("__none__", 0.0, D0, D0)], schema)
            .where("key_k != '__none__'")
        )
    expected = py_interlace(tables, [1] * n_tables)
    # default path and the bucketed range-join scale path must both
    # match the oracle (bucket width chosen to straddle the fixtures'
    # 1-5 day segments)
    for bucket_days in (None, 3):
        got = interlace(sdfs, by=["key_k"], bucket_days=bucket_days)
        got_rows = sorted(
            (
                tuple(
                    [r["key_k"]]
                    + [r[f"p{i}"] for i in range(n_tables)]
                    + [r["valid_from"], r["valid_until"]]
                )
                for r in got.collect()
            ),
            key=lambda r: tuple((x is None, x) for x in r),
        )
        assert got_rows == expected, f"bucket_days={bucket_days}"


@settings(max_examples=10, deadline=None)
@given(tables_strategy())
def test_truncate_interlace_bucketed_clip_equals_plain(tables):
    """The bucketed clip join (_bucketed_clip_join) plus bucketed
    spine must be a pure physical rewrite of truncate_interlace:
    row-identical to the plain path on random interval tables,
    including key-unmatched primaries (left-join NULL-extension) and
    open-ended rows (global-max bucket cap)."""
    from diseasystore_spark.operators.interlace import truncate_interlace

    spark = _get_spark()
    if not any(tables):
        return
    sdfs = []
    for i, t in enumerate(tables):
        schema = f"key_k string, p{i} double, valid_from date, valid_until date"
        sdfs.append(
            spark.createDataFrame(t or [("__none__", 0.0, D0, D0)], schema)
            .where("key_k != '__none__'")
        )
    primary, secondary = sdfs[0], sdfs[1:]
    plain = truncate_interlace(primary, secondary, bucket_days=None)
    bucketed = truncate_interlace(primary, secondary, bucket_days=3)
    key = lambda r: tuple((x is None, x) for x in r)  # noqa: E731
    a = sorted((tuple(r) for r in plain.collect()), key=key)
    b = sorted(
        (tuple(r) for r in bucketed.select(plain.columns).collect()), key=key
    )
    assert a == b


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 20)).map(
            lambda t: (
                D0 + datetime.timedelta(days=t[0]),
                D0 + datetime.timedelta(days=t[0] + t[1]),
            )
        ),
        max_size=5,
    ),
    st.integers(0, 30),
    st.integers(30, 70),
)
def test_missing_ranges_properties(covered, start_off, end_off):
    from diseasystore_spark.operators.missing_ranges import missing_date_ranges

    start = D0 + datetime.timedelta(days=start_off)
    end = D0 + datetime.timedelta(days=end_off)
    got = missing_date_ranges(covered, start, end)
    # every returned day is inside [start, end] and uncovered
    day = datetime.timedelta(days=1)
    covered_days = set()
    for s, e in covered:
        d = s
        while d <= e:
            covered_days.add(d)
            d += day
    returned_days = set()
    for s, e in got:
        assert start <= s <= e <= end
        d = s
        while d <= e:
            assert d not in covered_days
            returned_days.add(d)
            d += day
    # completeness: every uncovered requested day is returned
    d = start
    while d <= end:
        if d not in covered_days:
            assert d in returned_days
        d += day
    # segments are maximal (no two adjacent)
    for (s1, e1), (s2, e2) in zip(got, got[1:]):
        assert (s2 - e1).days > 1
