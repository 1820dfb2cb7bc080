"""Age helpers vs the reference goldens and a DuckDB oracle.

Reference: ``tests/testthat/test-age_helpers.R`` (labels :1-20,
leap-year-heavy age/add_years checks :23-391).
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from diseasystore_spark.functions.age import add_years, age_labels, age_on_date, cut_expr


def test_age_labels_golden():
    assert age_labels([5, 12, 20, 30]) == ["00-04", "05-11", "12-19", "20-29", "30+"]
    assert age_labels([5]) == ["0-4", "5+"]
    assert age_labels([15, 30]) == ["00-14", "15-29", "30+"]
    # 0 and Inf cuts are dropped (R/age_helpers.R:11)
    assert age_labels([0, 15, 30, float("inf")]) == ["00-14", "15-29", "30+"]
    assert age_labels([100]) == ["000-099", "100+"]


def test_age_labels_validation():
    with pytest.raises(ValueError):
        age_labels([30, 5])
    with pytest.raises(ValueError):
        age_labels([-1, 5])


def _leap_heavy_dates():
    births = [
        datetime.date(2000, 2, 29),
        datetime.date(2000, 2, 28),
        datetime.date(2000, 3, 1),
        datetime.date(1999, 12, 31),
        datetime.date(2004, 2, 29),
        datetime.date(1996, 2, 29),
        datetime.date(2001, 4, 3),
    ]
    refs = [
        datetime.date(2001, 2, 28),
        datetime.date(2001, 3, 1),
        datetime.date(2004, 2, 28),
        datetime.date(2004, 2, 29),
        datetime.date(2004, 3, 1),
        datetime.date(2024, 2, 28),
        datetime.date(2024, 2, 29),
        datetime.date(2024, 3, 1),
        datetime.date(2023, 12, 31),
    ]
    return [(b, r) for b in births for r in refs if b <= r]


def test_age_on_date_matches_duckdb(spark):
    """DuckDB's DATE_SUB('year', ...) is the reference's 'precise'
    backend (R/age_helpers.R:88-91)."""
    pairs = _leap_heavy_dates()
    df = spark.createDataFrame(pairs, "birth date, ref date")
    got = {
        (r["birth"], r["ref"]): r["age"]
        for r in df.withColumn("age", age_on_date("birth", F.col("ref"))).collect()
    }
    con = duckdb.connect()
    for b, r in pairs:
        expected = con.sql(
            f"select date_sub('year', DATE '{b}', DATE '{r}')"
        ).fetchone()[0]
        assert got[(b, r)] == expected, f"age({b}, {r})"


def test_add_years_matches_duckdb(spark):
    dates = [
        datetime.date(2000, 2, 29),
        datetime.date(2000, 2, 28),
        datetime.date(1999, 12, 31),
        datetime.date(2004, 2, 29),
        datetime.date(2001, 4, 3),
    ]
    years = [0, 1, 3, 4, 10, 100]
    rows = [(d, y) for d in dates for y in years]
    df = spark.createDataFrame(rows, "d date, y int")
    got = {
        (r["d"], r["y"]): r["out"]
        for r in df.withColumn("out", add_years("d", F.col("y"))).collect()
    }
    con = duckdb.connect()
    for d, y in rows:
        expected = con.sql(
            f"select cast(DATE '{d}' + {y} * INTERVAL 1 YEAR as date)"
        ).fetchone()[0]
        assert got[(d, y)] == expected, f"add_years({d}, {y})"


def test_cut_expr_bins(spark):
    df = spark.createDataFrame([(0,), (4,), (15,), (29,), (30,), (95,)], "age int")
    out = df.withColumn("age_group", cut_expr(F.col("age"), [15, 30])).collect()
    assert [r["age_group"] for r in out] == [
        "00-14",
        "00-14",
        "15-29",
        "15-29",
        "30+",
        "30+",
    ]
