"""Missing-range planner golden cases.

Mirrors ``tests/testthat/test-DiseasystoreBase.R:298-391``.
"""

from __future__ import annotations

import datetime

from diseasystore_spark.operators.missing_ranges import (
    compact_date_ranges,
    missing_date_ranges,
)

D = datetime.date
START = D(2020, 1, 1)
END = D(2020, 3, 1)


def days(n):
    return datetime.timedelta(days=n)


def test_fully_covered():
    assert missing_date_ranges([(START, END)], START, END) == []


def test_uncovered():
    assert missing_date_ranges([], START, END) == [(START, END)]


def test_right_extension():
    assert missing_date_ranges([(START, END)], START, END + days(5)) == [
        (END + days(1), END + days(5))
    ]


def test_left_extension():
    assert missing_date_ranges([(START, END)], START - days(5), END) == [
        (START - days(5), START - days(1))
    ]


def test_two_sided_extension():
    assert missing_date_ranges([(START, END)], START - days(5), END + days(5)) == [
        (START - days(5), START - days(1)),
        (END + days(1), END + days(5)),
    ]


def test_two_sided_asymmetric():
    assert missing_date_ranges([(START, END)], START - days(5), END + days(3)) == [
        (START - days(5), START - days(1)),
        (END + days(1), END + days(3)),
    ]


def test_multi_segment_coverage():
    covered = [(D(2020, 1, 1), D(2020, 1, 10)), (D(2020, 1, 20), D(2020, 1, 25))]
    assert missing_date_ranges(covered, D(2020, 1, 1), D(2020, 1, 31)) == [
        (D(2020, 1, 11), D(2020, 1, 19)),
        (D(2020, 1, 26), D(2020, 1, 31)),
    ]


def test_compact_date_ranges():
    assert compact_date_ranges([]) == []
    assert compact_date_ranges([D(2020, 1, 1)]) == [(D(2020, 1, 1), D(2020, 1, 1))]
    assert compact_date_ranges(
        [D(2020, 1, 3), D(2020, 1, 1), D(2020, 1, 2), D(2020, 1, 5)]
    ) == [(D(2020, 1, 1), D(2020, 1, 3)), (D(2020, 1, 5), D(2020, 1, 5))]
