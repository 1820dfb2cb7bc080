from diseasystore_spark.functions.age import add_years, age_labels, age_on_date, cut_expr
from diseasystore_spark.functions.dates import date_spine, iso_yearweek_start
from diseasystore_spark.functions.intervals import (
    case_max,
    case_min,
    clamp_to_study_period,
    overlaps_study_period,
)

__all__ = [
    "add_years",
    "age_labels",
    "age_on_date",
    "case_max",
    "case_min",
    "clamp_to_study_period",
    "cut_expr",
    "date_spine",
    "iso_yearweek_start",
    "overlaps_study_period",
]
