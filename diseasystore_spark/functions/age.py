"""Age and age-group helpers.

Parity targets (reference ``R/age_helpers.R``):

- ``age_labels`` — zero-padded sortable labels (``R/age_helpers.R:8-21``).
- ``age_on_date`` — calendar-exact floor-years between birth and a
  reference date. The reference emits per-backend SQL
  (``R/age_helpers.R:42-91``); on Spark a single implementation
  matches the precise (DuckDB/PostgreSQL) semantics, so the dialect
  problem disappears.
- ``add_years`` — calendar-exact whole-year add with Feb-29 -> Feb-28
  clamping, matching SQL ``INTERVAL '1 year'`` semantics
  (``R/age_helpers.R:112-156``).
"""

from __future__ import annotations

import datetime
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def age_labels(age_cuts: Sequence[float]) -> list[str]:
    """Sortable, zero-padded age-group labels.

    ``age_labels([5, 12, 20, 30]) -> ["00-04", "05-11", "12-19", "20-29", "30+"]``

    Mirrors ``R/age_helpers.R:8-21``: cuts must be unique, sorted and
    non-negative; 0 is implicitly the first lower bound; non-finite and
    zero cuts are dropped; pad width is the number of digits of the
    largest cut.
    """
    cuts = list(age_cuts)
    if sorted(set(cuts)) != cuts:
        raise ValueError("age_cuts must be unique and sorted")
    if any(c < 0 for c in cuts):
        raise ValueError("age_cuts must be non-negative")
    finite = [int(c) for c in cuts if c > 0 and c != float("inf")]
    width = len(str(max([0, *finite])))
    lowers = [0, *finite]
    labels = []
    for lo, hi in zip(lowers, finite):
        labels.append(f"{lo:0{width}d}-{hi - 1:0{width}d}")
    labels.append(f"{lowers[-1]:0{width}d}+")
    return labels


def _date_col(value: Column | str | datetime.date) -> Column:
    if isinstance(value, Column):
        return value
    if isinstance(value, datetime.date):
        return F.lit(value)
    return F.col(value)


def age_on_date(
    birth: Column | str, reference_date: Column | str | datetime.date
) -> Column:
    """Calendar-exact age in whole years on ``reference_date``.

    Anniversary semantics with month-end clamping: the n-th birthday is
    ``birth + n years`` where Feb-29 clamps to Feb-28 in non-leap years,
    and ``age = max n with anniversary <= ref``. This matches DuckDB
    ``DATE_SUB('year', birth, ref)`` exactly (verified on leap-year
    edges) — the reference's "precise" backend (``R/age_helpers.R:88-91``).
    Pure built-in expressions: stays in whole-stage codegen, no UDF.
    """
    b = _date_col(birth)
    r = _date_col(reference_date)
    year_diff = F.year(r) - F.year(b)
    anniversary = F.add_months(b, year_diff * 12)
    return (year_diff - (anniversary > r).cast("int")).cast("int")


def add_years(reference_date: Column | str | datetime.date, years: Column | int) -> Column:
    """Add whole calendar years (Feb-29 clamps to Feb-28 in non-leap
    years), matching ``birth + n * INTERVAL '1 year'`` on precise
    backends (``R/age_helpers.R:139-156``). Implemented as
    ``add_months(date, 12 * n)``."""
    r = _date_col(reference_date)
    n = years if isinstance(years, Column) else F.lit(years)
    return F.add_months(r, n * 12)


def cut_expr(
    col: Column | str,
    breaks: Sequence[float],
    labels: Sequence[str] | None = None,
) -> Column:
    """Right-open binning ``cut(x, breaks, right=FALSE)`` as a CASE
    chain — the construct used inside stratification expressions
    (``vignettes/extending-diseasystore-example.Rmd:539-545``).

    ``breaks`` are the lower bounds of the bins above 0 (like
    ``age_labels``); values below the first break land in the implicit
    ``[0, break1)`` bin. Returns NULL outside all bins (negative input).
    """
    c = _date_col(col) if isinstance(col, str) else col
    finite = [b for b in breaks if b != float("inf")]
    if labels is None:
        labels = age_labels(finite)
    lowers = [0, *finite]
    uppers = [*finite, None]
    expr = None
    for lo, hi, lab in zip(lowers, uppers, labels):
        cond = c >= F.lit(lo)
        if hi is not None:
            cond = cond & (c < F.lit(hi))
        expr = F.when(cond, F.lit(lab)) if expr is None else expr.when(cond, F.lit(lab))
    return expr
