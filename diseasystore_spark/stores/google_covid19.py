"""Google-COVID-19-analog store: semi-aggregated multi-level data.

Parity target ``R/DiseasystoreGoogleCovid19.R``. Exercises:

- CSV sources with row limit (S1/S2) via ``source_conn_path`` (zipped
  variants resolve transparently);
- wide->long unpivot on the ``_age_`` name separator (F1) for the
  by-age metrics and demographics;
- multi-feature handlers (``google_covid_19_index`` serves six
  features);
- the age-bin -> age-group map with per-location label construction —
  the reference uses an R ``group_modify`` (A10); here it is rewritten
  relationally with a ``lead`` window + zero-padded labels, so it
  stays JVM-side;
- the ``key_join_filter`` double-count elimination hook (P6): Google
  counts people at country AND region AND subregion level, so the
  stratification level picks which rows survive.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from diseasystore_spark.config import diseasyoption
from diseasystore_spark.operators.aggregators import (
    key_join_max,
    key_join_min,
    key_join_sum,
)
from diseasystore_spark.plans.feature_handler import FeatureHandler
from diseasystore_spark.plans.store import Diseasystore
from diseasystore_spark.sources.csv import read_csv_source
from diseasystore_spark.sources.helpers import source_conn_path

DATA_EPOCH = datetime.date(2020, 1, 1)


def _read(ds, file: str) -> DataFrame:
    path = source_conn_path(ds.source_conn, file)
    n_max = diseasyoption("n_max", "GoogleCovid19Diseasystore")
    return read_csv_source(ds.spark, path, n_max=n_max)


def _unpivot_age_columns(
    df: DataFrame, id_cols: list[str], prefix: str, value_name: str, key_name: str
) -> DataFrame:
    """pivot_longer(names_sep="_age_") analog: unpivot all
    ``<prefix>_age_<bin>`` columns into (key_name, value_name) rows."""
    age_cols = [c for c in df.columns if c.startswith(f"{prefix}_age_")]
    if not age_cols:
        raise ValueError(f"no columns matching {prefix}_age_* in {df.columns}")
    pairs = []
    for c in age_cols:
        bin_id = c.split("_age_", 1)[1]
        pairs.append((bin_id, c))
    stack_args = ", ".join(
        f"'{b}', CAST(`{c}` AS DOUBLE)" for b, c in pairs
    )
    return df.selectExpr(
        *id_cols,
        f"stack({len(pairs)}, {stack_args}) AS ({key_name}, {value_name})",
    )


def google_covid_19_metric(google_pattern: str, out_name: str) -> FeatureHandler:
    """FeatureHandler factory for the by-age metrics
    (``R/DiseasystoreGoogleCovid19.R:14-38``)."""

    def compute(start_date, end_date, slice_ts, source_conn, ds):
        raw = _read(ds, "by-age.csv")
        raw = raw.withColumn("date", F.col("date").cast("date")).where(
            (F.col("date") >= F.lit(DATA_EPOCH))
            & (F.col("date") >= F.lit(start_date))
            & (F.col("date") <= F.lit(end_date))
        )
        keep = ["location_key", "date"] + [
            c for c in raw.columns if c.startswith(f"new_{google_pattern}_age_")
        ]
        long = _unpivot_age_columns(
            raw.select(*keep),
            ["location_key", "date"],
            f"new_{google_pattern}",
            out_name,
            "key_age_bin",
        )
        return long.select(
            F.col("location_key").alias("key_location"),
            "key_age_bin",
            out_name,
            F.col("date").alias("valid_from"),
            F.date_add(F.col("date"), 1).alias("valid_until"),
        )

    return FeatureHandler(compute=compute, key_join=key_join_sum)


def _compute_population(start_date, end_date, slice_ts, source_conn, ds):
    """Demographics unpivot with age-group label normalization
    (``R/DiseasystoreGoogleCovid19.R:88-111``): bounds parsed from the
    column name; open-ended groups get a '+' suffix."""
    raw = _read(ds, "demographics.csv")
    keep = ["location_key"] + [
        c for c in raw.columns if c.startswith("population_age_")
    ]
    long = _unpivot_age_columns(
        raw.select(*keep), ["location_key"], "population", "n_population", "age_group"
    )
    lower = F.regexp_extract(F.col("age_group"), r"^\d*", 0)
    upper = F.regexp_extract(F.col("age_group"), r"\d*$", 0)
    label = F.when(upper == "", F.concat(lower, F.lit("+"))).otherwise(
        F.concat(lower, F.lit("-"), upper)
    )
    return long.select(
        F.col("location_key").alias("key_location"),
        label.alias("age_group"),
        "n_population",
        F.lit(DATA_EPOCH).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_until"),
    )


def _compute_index(start_date, end_date, slice_ts, source_conn, ds):
    """The spatial index: one handler serving country/region/subregion
    ids and names (``R/DiseasystoreGoogleCovid19.R:113-141``)."""
    raw = _read(ds, "index.csv")
    region_id = F.concat_ws(
        "_", F.col("country_code"), F.col("subregion1_code")
    )
    return raw.select(
        F.col("location_key").alias("key_location"),
        F.col("country_code").alias("country_id"),
        F.col("country_name").alias("country"),
        F.when(F.col("country_code") == region_id, None)
        .otherwise(region_id)
        .alias("region_id"),
        F.col("subregion1_name").alias("region"),
        F.col("location_key").alias("subregion_id"),
        F.col("subregion2_name").alias("subregion"),
        F.col("aggregation_level").cast("int").alias("aggregation_level"),
        F.lit(DATA_EPOCH).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_until"),
    )


def _compute_age_group(start_date, end_date, slice_ts, source_conn, ds):
    """age_bin -> age_group map (``R/DiseasystoreGoogleCovid19.R:150-197``).

    Locations whose bin layout changes over time are discarded (A9);
    labels are built relationally (lead window + zero-padding by the
    per-location max-bound width) instead of the reference's R
    group_modify (A10) — same labels, fully JVM-side.
    """
    raw = _read(ds, "by-age.csv")
    bin_cols = [c for c in raw.columns if c.startswith("age_bin_")]
    layouts = raw.select("location_key", *bin_cols).distinct()
    stable = (
        layouts.groupBy("location_key")
        .agg(F.count(F.lit(1)).alias("n_layouts"))
        .where(F.col("n_layouts") == 1)
        .select("location_key")
    )
    one_layout = layouts.join(stable, "location_key")

    pairs = []
    for c in bin_cols:
        pairs.append((c.split("age_bin_", 1)[1], c))
    stack_args = ", ".join(f"'{b}', CAST(`{c}` AS STRING)" for b, c in pairs)
    long = one_layout.selectExpr(
        "location_key",
        f"stack({len(pairs)}, {stack_args}) AS (age_bin, bin_label)",
    ).where(F.col("bin_label").isNotNull())
    long = long.withColumn(
        "lower", F.regexp_extract(F.col("bin_label"), r"^\d*", 0).cast("int")
    ).where(F.col("lower").isNotNull())

    w = Window.partitionBy("location_key").orderBy("lower")
    width = F.length(
        F.max(F.col("lower")).over(Window.partitionBy("location_key")).cast("string")
    )
    nxt = F.lead("lower").over(w)
    label = F.when(
        nxt.isNull(), F.concat(F.lpad(F.col("lower"), width, "0"), F.lit("+"))
    ).otherwise(
        F.concat(
            F.lpad(F.col("lower"), width, "0"),
            F.lit("-"),
            F.lpad(nxt - 1, width, "0"),
        )
    )
    return long.select(
        F.col("location_key").alias("key_location"),
        F.col("age_bin").alias("key_age_bin"),
        label.alias("age_group"),
        F.lit(DATA_EPOCH).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_until"),
    )


def _weather_metric(column: str, out_name: str, aggregator) -> FeatureHandler:
    def compute(start_date, end_date, slice_ts, source_conn, ds):
        raw = _read(ds, "weather.csv")
        raw = raw.withColumn("date", F.col("date").cast("date")).where(
            (F.col("date") >= F.lit(start_date)) & (F.col("date") <= F.lit(end_date))
        )
        return raw.select(
            F.col("location_key").alias("key_location"),
            F.col(column).cast("double").alias(out_name),
            F.col("date").alias("valid_from"),
            F.date_add(F.col("date"), 1).alias("valid_until"),
        )

    return FeatureHandler(compute=compute, key_join=aggregator)


class GoogleCovid19Diseasystore(Diseasystore):
    _ds_map = {
        "n_population": "google_covid_19_population",
        "age_group": "google_covid_19_age_group",
        "country_id": "google_covid_19_index",
        "country": "google_covid_19_index",
        "region_id": "google_covid_19_index",
        "region": "google_covid_19_index",
        "subregion_id": "google_covid_19_index",
        "subregion": "google_covid_19_index",
        "n_hospital": "google_covid_19_hospital",
        "n_deaths": "google_covid_19_deaths",
        "n_positive": "google_covid_19_positive",
        "n_icu": "google_covid_19_icu",
        "n_ventilator": "google_covid_19_ventilator",
        "min_temperature": "google_covid_19_min_temperature",
        "max_temperature": "google_covid_19_max_temperature",
    }
    # Observables include trailing *_temperature (custom regex,
    # ``R/DiseasystoreGoogleCovid19.R:82``).
    _observables_regex = r"^n_(?=\w)|_temperature$"
    _label = "Google COVID-19"
    _min_start_date = DATA_EPOCH
    _max_end_date = datetime.date(2022, 9, 15)

    google_covid_19_population = FeatureHandler(
        compute=_compute_population, key_join=key_join_sum
    )
    google_covid_19_index = FeatureHandler(
        compute=_compute_index, key_join=key_join_sum
    )
    google_covid_19_age_group = FeatureHandler(
        compute=_compute_age_group, key_join=key_join_sum
    )
    google_covid_19_hospital = google_covid_19_metric(
        "hospitalized_patients", "n_hospital"
    )
    google_covid_19_deaths = google_covid_19_metric("deceased", "n_deaths")
    google_covid_19_positive = google_covid_19_metric("confirmed", "n_positive")
    google_covid_19_icu = google_covid_19_metric(
        "intensive_care_patients", "n_icu"
    )
    google_covid_19_ventilator = google_covid_19_metric(
        "ventilator_patients", "n_ventilator"
    )
    google_covid_19_min_temperature = _weather_metric(
        "minimum_temperature_celsius", "min_temperature", key_join_min
    )
    google_covid_19_max_temperature = _weather_metric(
        "maximum_temperature_celsius", "max_temperature", key_join_max
    )

    SPATIAL_FEATURES = (
        "country_id",
        "country",
        "region_id",
        "region",
        "subregion_id",
        "subregion",
    )

    def key_join_filter(
        self,
        data: DataFrame,
        stratification_features: list[str],
        start_date: datetime.date,
        end_date: datetime.date,
    ) -> DataFrame:
        """De-double-counting (P6,
        ``R/DiseasystoreGoogleCovid19.R:241-277``): pick the spatial
        aggregation level matching the requested stratification; with
        no spatial stratification, keep each country's coarsest level
        (window min + semi join)."""
        feats = stratification_features or []
        if not any(f in self.SPATIAL_FEATURES for f in feats):
            index = self.get_feature("country_id", start_date, end_date)
            w = Window.partitionBy("country_id")
            filter_level = (
                index.withColumn(
                    "min_level", F.min("aggregation_level").over(w)
                )
                .where(F.col("aggregation_level") == F.col("min_level"))
                .select("key_location")
            )
            return data.join(
                F.broadcast(filter_level), "key_location", "left_semi"
            )
        if any(f in ("country_id", "country") for f in feats):
            return data.where(F.col("key_location") == F.col("country_id"))
        if any(f in ("region_id", "region") for f in feats):
            return data.where(F.col("key_location") == F.col("region_id"))
        if any(f in ("subregion_id", "subregion") for f in feats):
            return data.where(F.col("key_location") == F.col("subregion_id"))
        raise RuntimeError(
            "Edge case detected in key_join_filter (GoogleCovid19Diseasystore)"
        )
