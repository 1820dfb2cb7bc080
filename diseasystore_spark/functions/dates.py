"""Date sequence / calendar helpers.

``date_spine`` is the Spark-native replacement for the reference's
driver-generated ``seq.Date`` uploaded via ``copy_to``
(``R/DiseasystoreBase.R:471-476``): a one-row ``sequence()`` +
``explode`` stays entirely JVM-side and scales to arbitrary spans
without driver round-trips.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def date_spine(
    spark: SparkSession,
    start_date: datetime.date,
    end_date: datetime.date,
    column: str = "date",
) -> DataFrame:
    """Dense daily date spine ``[start_date, end_date]`` (inclusive),
    generated JVM-side via ``sequence`` + ``explode``."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start_date).cast("date"),
                F.lit(end_date).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias(column)
    )


def iso_yearweek_start(yearweek: Column | str) -> Column:
    """Monday of an ISO year-week string like ``2023-W45``
    (reference: ``ISOweek::ISOweek2date(paste0(yearweek, "-1"))`` at
    ``R/DiseasystoreEcdcRespiratoryViruses.R:75``).

    Implemented arithmetically (ISO 8601): Jan 4 is always in week 1;
    the Monday of week 1 is ``jan4 - (isoweekday(jan4) - 1)`` and week
    N starts ``(N-1) * 7`` days later. Pure built-in date math.
    """
    yw = F.col(yearweek) if isinstance(yearweek, str) else yearweek
    year = F.substring(yw, 1, 4).cast("int")
    week = F.regexp_extract(yw, r"W(\d{2})", 1).cast("int")
    jan4 = F.make_date(year, F.lit(1), F.lit(4))
    # Spark weekday(): Monday = 0 ... Sunday = 6 (ISO offset directly).
    week1_monday = F.date_sub(jan4, F.weekday(jan4))
    return F.date_add(week1_monday, (week - F.lit(1)) * 7)
