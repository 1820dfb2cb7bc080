"""Simulist-analog store: individual-level line-list features.

Parity target ``R/DiseasystoreSimulist.R``: features ``birth``,
``age``, ``sex``, ``n_positive``, ``n_admission``, ``n_hospital`` over
a synthetic outbreak line list (schema per FIXTURES.md §1). Exercises:

- recursive feature computation via the ``ds`` back-reference
  (``age`` <- ``birth``, ``sex`` <- ``birth``, ``n_admission`` <-
  ``n_hospital``);
- the calendar-exact age pipeline (F7/F8) with per-birthday validity
  intervals;
- right-join validity inheritance (J6);
- ``key_join_count`` aggregation.

Spark-first deviation (documented): the reference builds the age
timeline with an R-side loop of unions
(``R/DiseasystoreSimulist.R:91-114``) because SQL cannot reference a
column created in the same SELECT. Spark generates all birthday
iterations in one pass with ``explode(sequence(0, n))`` — same rows,
one plan, no union chain.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diseasystore_spark.functions.age import add_years, age_on_date
from diseasystore_spark.operators.aggregators import key_join_count
from diseasystore_spark.plans.feature_handler import FeatureHandler
from diseasystore_spark.plans.store import Diseasystore

OUTBREAK_START = datetime.date(2019, 12, 1)


def simulist_linelist(spark: SparkSession, n: int = 1000) -> DataFrame:
    """Deterministic synthetic line list (shape per FIXTURES.md §1:
    id, case_type, sex, birth, age, date_onset, date_admission,
    date_discharge, date_death; invariants birth <= onset <= admission
    <= discharge, death = discharge when present). Generated JVM-side
    from ``spark.range`` — no driver data."""
    df = spark.range(1, n + 1).withColumnRenamed("id", "idx")
    case_type = (
        F.when(F.col("idx") % 10 < 2, "suspected")
        .when(F.col("idx") % 10 < 5, "probable")
        .otherwise("confirmed")
    )
    age = (F.col("idx") * 7 % 90 + 1).cast("int")
    onset = F.date_add(F.lit(OUTBREAK_START), (F.col("idx") * 13 % 120).cast("int"))
    birth = F.date_sub(
        F.date_sub(onset, (F.col("idx") % 365).cast("int")),
        (age * 365).cast("int"),
    )
    hospitalized = (case_type == "confirmed") & (F.col("idx") % 2 == 0)
    admission = F.when(hospitalized, F.date_add(onset, (F.col("idx") % 5).cast("int")))
    discharge = F.when(
        hospitalized, F.date_add(admission, (F.col("idx") * 3 % 20).cast("int"))
    )
    death = F.when(hospitalized & (F.col("idx") % 8 == 0), discharge)
    return df.select(
        F.col("idx").cast("int").alias("id"),
        case_type.alias("case_type"),
        F.when(F.col("idx") % 2 == 0, "m").otherwise("f").alias("sex"),
        birth.alias("birth"),
        age.alias("age"),
        onset.alias("date_onset"),
        admission.alias("date_admission"),
        discharge.alias("date_discharge"),
        death.alias("date_death"),
    )


def _linelist(ds: Diseasystore) -> DataFrame:
    if isinstance(ds.source_conn, DataFrame):
        return ds.source_conn
    if isinstance(ds.source_conn, str) and ds.source_conn.endswith(".parquet"):
        return ds.spark.read.parquet(ds.source_conn)
    return simulist_linelist(ds.spark)


def _compute_birth(start_date, end_date, slice_ts, source_conn, ds):
    """Birth dates, valid from birth until death + 1 day
    (``R/DiseasystoreSimulist.R:60-76``)."""
    data = _linelist(ds)
    out = data.select(
        F.col("id").alias("key_pnr"),
        F.col("birth"),
        F.col("birth").alias("valid_from"),
        F.date_add(F.col("date_death"), 1).alias("valid_until"),
    )
    return out.where(
        (F.lit(start_date) < F.col("valid_until")) | F.col("valid_until").isNull()
    ).where(F.col("valid_from") <= F.lit(end_date))


def _compute_age(start_date, end_date, slice_ts, source_conn, ds):
    """Per-birthday age intervals (``R/DiseasystoreSimulist.R:80-119``),
    generated in one pass with explode(sequence(...))."""
    birth_feature = ds.get_feature("birth", start_date, end_date, slice_ts)
    n_iter = (end_date - start_date).days // 365 + 1
    aged = birth_feature.withColumn(
        "age_at_start", age_on_date("birth", start_date)
    )
    exploded = aged.select(
        "key_pnr",
        "birth",
        "valid_until",
        "age_at_start",
        F.explode(F.sequence(F.lit(0), F.lit(n_iter))).alias("iteration"),
    ).select(
        "key_pnr",
        "birth",
        "valid_until",
        (F.col("age_at_start") + F.col("iteration")).alias("age"),
    )
    with_bday = exploded.withColumn(
        "birthday", add_years(F.col("birth"), F.col("age"))
    ).withColumn(
        # Reference adds one year to the *clamped* birthday (:101) —
        # a Feb-29 birth therefore anchors to Feb-28 forever after.
        "next_birthday",
        add_years(F.col("birthday"), 1),
    )
    return (
        with_bday.where(F.col("birthday") <= F.lit(end_date))
        .where(
            (F.col("birthday") < F.col("valid_until"))
            | F.col("valid_until").isNull()
        )
        .select(
            "key_pnr",
            F.col("age").cast("int").alias("age"),
            F.col("birthday").alias("valid_from"),
            F.least(F.col("valid_until"), F.col("next_birthday")).alias(
                "valid_until"
            ),
        )
    )


def _compute_sex(start_date, end_date, slice_ts, source_conn, ds):
    """Sex labels inheriting validity from the birth feature via a
    right join (J6, ``R/DiseasystoreSimulist.R:123-144``)."""
    data = _linelist(ds)
    birth_feature = ds.get_feature("birth", start_date, end_date, slice_ts)
    joined = data.join(
        birth_feature, data["id"] == birth_feature["key_pnr"], "right"
    )
    return joined.select(
        F.col("key_pnr"),
        F.when(F.col("sex") == "m", "Male").otherwise("Female").alias("sex"),
        "valid_from",
        "valid_until",
    )


def _compute_positive(start_date, end_date, slice_ts, source_conn, ds):
    data = _linelist(ds)
    out = data.where(F.col("case_type") == "confirmed").select(
        F.col("id").alias("key_pnr"),
        F.col("date_onset").alias("valid_from"),
        F.date_add(F.col("date_onset"), 1).alias("valid_until"),
    )
    return out.where(
        (F.lit(start_date) < F.col("valid_until"))
        & (F.col("valid_from") <= F.lit(end_date))
    )


def _compute_hospital(start_date, end_date, slice_ts, source_conn, ds):
    data = _linelist(ds)
    out = data.where(
        (F.col("case_type") == "confirmed") & F.col("date_admission").isNotNull()
    ).select(
        F.col("id").alias("key_pnr"),
        F.col("date_admission").alias("valid_from"),
        F.date_add(F.col("date_discharge"), 1).alias("valid_until"),
    )
    return out.where(
        (F.lit(start_date) < F.col("valid_until"))
        & (F.col("valid_from") <= F.lit(end_date))
    )


def _compute_admission(start_date, end_date, slice_ts, source_conn, ds):
    """Admissions = first hospital day (recursive feature,
    ``R/DiseasystoreSimulist.R:189-199``)."""
    hospital = ds.get_feature("n_hospital", start_date, end_date, slice_ts)
    return hospital.withColumn(
        "valid_until", F.date_add(F.col("valid_from"), 1)
    ).where(F.lit(start_date) < F.col("valid_until"))


class SimulistDiseasystore(Diseasystore):
    _ds_map = {
        "birth": "simulist_birth",
        "age": "simulist_age",
        "sex": "simulist_sex",
        "n_positive": "simulist_positive",
        "n_admission": "simulist_admission",
        "n_hospital": "simulist_hospital",
    }
    _label = "Simulist Synthetic Data"
    _min_start_date = OUTBREAK_START

    simulist_birth = FeatureHandler(compute=_compute_birth, key_join=key_join_count)
    simulist_age = FeatureHandler(compute=_compute_age, key_join=key_join_count)
    simulist_sex = FeatureHandler(compute=_compute_sex, key_join=key_join_count)
    simulist_positive = FeatureHandler(
        compute=_compute_positive, key_join=key_join_count
    )
    simulist_admission = FeatureHandler(
        compute=_compute_admission, key_join=key_join_count
    )
    simulist_hospital = FeatureHandler(
        compute=_compute_hospital, key_join=key_join_count
    )
