"""Shared operator-level helpers."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def null_safe_on(left: str, right: str, cols: list[str]) -> Column:
    """AND-fold of ``eqNullSafe`` over ``cols`` between two aliased
    frames — the multi-column null-safe join key.

    A NULL group/key column is a legitimate stratum across this
    package's grouped operators (quantile normalization, MAD
    flagging, LOCF series): plain equality join keys silently orphan
    it (NULL never equals NULL), handing its rows NULL stats or
    blanked values with no error. Every stat-join-back uses this one
    helper so the policy can't drift per operator.
    """
    return reduce(
        lambda a, b: a & b,
        [
            F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
            for c in cols
        ],
    )
