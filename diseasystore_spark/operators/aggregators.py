"""Feature aggregators — the ``key_join`` family.

Parity with ``R/1_aggregators.R``:

- ``key_join_sum``  — ``sum(as.numeric(feature), na.rm=TRUE)`` (:21-27)
- ``key_join_max``  — (:31-37)
- ``key_join_min``  — (:41-47)
- ``key_join_count``— row count, keyed on the *first* ``key_*`` column
  (:51-57) — i.e. plain ``count(*)`` of the group.

Each aggregator is a callable ``(GroupedData, feature_name) ->
DataFrame`` producing a single aggregate column named ``n`` — Spark's
built-in JVM aggregates (map-side partial aggregation for free).
NA-handling parity: Spark ``sum``/``max``/``min`` skip NULLs, matching
``na.rm=TRUE``; an all-NULL group yields NULL (R would yield 0 for
sum, but with na.rm the reference's SQL translation also yields NULL —
backend SQL semantics, which we match).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.group import GroupedData

Aggregator = Callable[[GroupedData, str], DataFrame]


def key_join_sum(grouped: GroupedData, feature: str) -> DataFrame:
    return grouped.agg(F.sum(F.col(feature).cast("double")).alias("n"))


def key_join_max(grouped: GroupedData, feature: str) -> DataFrame:
    return grouped.agg(F.max(F.col(feature).cast("double")).alias("n"))


def key_join_min(grouped: GroupedData, feature: str) -> DataFrame:
    return grouped.agg(F.min(F.col(feature).cast("double")).alias("n"))


def key_join_count(grouped: GroupedData, feature: str) -> DataFrame:
    return grouped.agg(F.count(F.lit(1)).alias("n"))


AGGREGATORS: dict[str, Aggregator] = {
    "key_join_sum": key_join_sum,
    "key_join_max": key_join_max,
    "key_join_min": key_join_min,
    "key_join_count": key_join_count,
}
