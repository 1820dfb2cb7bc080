"""Missing-range determination — the reference's batch-memoization core.

Parity target: ``R/DiseasystoreBase.R:522-605`` (public
``determine_missing_ranges``) and its golden cases
(``tests/testthat/test-DiseasystoreBase.R:298-391``).

The reference collects the (tiny, per-range-write) log table to the
driver and does day-set arithmetic locally; we do the same — log
cardinality is one row per completed range write, so driver-side math
is correct at any data scale. The *data* never moves.
"""

from __future__ import annotations

import datetime

ONE_DAY = datetime.timedelta(days=1)


def compact_date_ranges(
    dates: list[datetime.date],
) -> list[tuple[datetime.date, datetime.date]]:
    """Compact a set of days into contiguous inclusive [start, end]
    segments (gap/island segmentation via day-difference > 1, mirroring
    the lag/cumsum at ``R/DiseasystoreBase.R:587-604``)."""
    if not dates:
        return []
    days = sorted(set(dates))
    ranges = []
    seg_start = prev = days[0]
    for d in days[1:]:
        if (d - prev).days > 1:
            ranges.append((seg_start, prev))
            seg_start = d
        prev = d
    ranges.append((seg_start, prev))
    return ranges


def missing_date_ranges(
    covered: list[tuple[datetime.date, datetime.date]],
    start_date: datetime.date,
    end_date: datetime.date,
) -> list[tuple[datetime.date, datetime.date]]:
    """Days in ``[start_date, end_date]`` not covered by any inclusive
    range in ``covered``, compacted to contiguous segments
    (``R/DiseasystoreBase.R:561-604``)."""
    covered_days: set[datetime.date] = set()
    for s, e in covered:
        d = s
        while d <= e:
            covered_days.add(d)
            d += ONE_DAY
    wanted = []
    d = start_date
    while d <= end_date:
        if d not in covered_days:
            wanted.append(d)
        d += ONE_DAY
    return compact_date_ranges(wanted)
