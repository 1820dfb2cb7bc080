"""ECDC-respiratory-viruses-analog store.

Parity target ``R/DiseasystoreEcdcRespiratoryViruses.R``. Exercises:

- snapshot-dated source files resolved by fuzzy as-of matching (S3,
  ``source_conn_github``) — the file read depends on ``slice_ts``;
- ISO year-week -> validity interval conversion (F9);
- the *identity* aggregator (A4): consultation rates are not summable,
  so ``key_join`` returns the grouped data unchanged;
- ``key_join_filter`` on age_group NULL-ness (P6): totals are separate
  rows, so stratified queries keep non-NULL age groups and
  unstratified queries keep only the totals.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diseasystore_spark.config import diseasyoption
from diseasystore_spark.functions.dates import iso_yearweek_start
from diseasystore_spark.plans.feature_handler import FeatureHandler
from diseasystore_spark.plans.store import Diseasystore
from diseasystore_spark.sources.csv import read_csv_source
from diseasystore_spark.sources.helpers import source_conn_github


def identity_key_join(grouped, feature):
    """A4: rates cannot be summed — the aggregator is the identity on
    the underlying data (``R/DiseasystoreEcdcRespiratoryViruses.R:85``).

    Note: like the reference, this aggregator cannot flow through the
    prevalence pipeline (there is no ``n`` column to cumulate) — and
    none of this store's features are observables (nothing matches
    ``^n_``), so ``key_join_features`` is unreachable here; rates are
    consumed via ``get_feature`` directly."""
    return getattr(grouped, "_df", grouped)


def _compute_iliari(start_date, end_date, slice_ts, source_conn, ds):
    snapshot_date = (
        slice_ts if isinstance(slice_ts, datetime.date) else
        datetime.datetime.fromisoformat(str(slice_ts)).date()
    )
    path = source_conn_github(
        source_conn,
        f"data/snapshots/{snapshot_date}_ILIARIRates.csv",
        pull=diseasyoption("pull", "EcdcRespiratoryVirusesDiseasystore", default=False),
    )
    raw = read_csv_source(ds.spark, path)
    out = raw.select(
        F.col("countryname").alias("key_location"),
        F.when(F.col("age") == "0-4", "00-04")
        .when(F.col("age") == "5-14", "05-14")
        .when(F.col("age") == "total", None)
        .otherwise(F.col("age"))
        .alias("age_group"),
        F.when(F.col("indicator") == "ILIconsultationrate", "ILI")
        .when(F.col("indicator") == "ARIconsultationrate", "ARI")
        .alias("infection_type"),
        F.col("value").cast("double").alias("rate"),
        iso_yearweek_start("yearweek").alias("valid_from"),
    ).withColumn("valid_until", F.date_add(F.col("valid_from"), 7))
    return out.where(
        (F.lit(start_date) < F.col("valid_until"))
        & (F.col("valid_from") <= F.lit(end_date))
    )


class EcdcRespiratoryVirusesDiseasystore(Diseasystore):
    _ds_map = {
        "iliari_rates": "ecdc_respitory_viruses_iliari_rates",
        "infection_type": "ecdc_respitory_viruses_iliari_rates",
        "age_group": "ecdc_respitory_viruses_iliari_rates",
    }
    _label = "ECDC Respitory Viruses"
    _min_start_date = datetime.date(2014, 9, 29)

    ecdc_respitory_viruses_iliari_rates = FeatureHandler(
        compute=_compute_iliari, key_join=identity_key_join
    )

    def key_join_filter(
        self,
        data: DataFrame,
        stratification_features: list[str],
        start_date: datetime.date,
        end_date: datetime.date,
    ) -> DataFrame:
        """Keep per-age rows when stratifying by age_group; totals
        otherwise (``R/DiseasystoreEcdcRespiratoryViruses.R:89-104``)."""
        if stratification_features and "age_group" in stratification_features:
            return data.where(F.col("age_group").isNotNull())
        return data.where(F.col("age_group").isNull())
