"""Conformance-style tests for the bundled store analogs, mirroring the
reference's exported test suite structure (``R/test_diseasystore.R``):
store+readback losslessness, data-contract assertions, memoization,
and the key_join matrix."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from diseasystore_spark.contract import validate_feature_frame
from diseasystore_spark.stores.ecdc import EcdcRespiratoryVirusesDiseasystore
from diseasystore_spark.stores.google_covid19 import GoogleCovid19Diseasystore
from diseasystore_spark.stores.simulist import (
    SimulistDiseasystore,
    simulist_linelist,
)
from tests.store_fixtures import write_ecdc_snapshots, write_google_fixtures

D = datetime.date


# ---------------------------------------------------------------- simulist

@pytest.fixture(scope="module")
def simulist(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("simulist_store"))
    return SimulistDiseasystore(
        spark,
        target_conn=root,
        source_conn="synthetic",
        slice_ts=D(2024, 1, 1),
        verbose=False,
    )


START, END = D(2019, 12, 10), D(2020, 1, 31)


def test_simulist_features_contract(simulist):
    for feature in simulist.available_features:
        df = simulist.get_feature(feature, START, END)
        validate_feature_frame(df)
        assert df.count() > 0, feature


def test_simulist_age_intervals_partition_lifetime(spark, simulist):
    """Per-person age intervals must tile [birthday_0, valid_until)
    without overlap and ages must be consecutive."""
    age = simulist.get_feature("age", START, END)
    rows = age.where(F.col("key_pnr").isin([2, 10, 77])).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key_pnr"], []).append(r)
    for key, rs in by_key.items():
        rs.sort(key=lambda r: r["valid_from"])
        for a, b in zip(rs, rs[1:]):
            assert a["valid_until"] == b["valid_from"], key
            assert b["age"] == a["age"] + 1, key


def test_simulist_age_matches_age_on_date(spark, simulist):
    """Golden cross-check: the age valid on a probe date equals the
    calendar age computed directly from the line list."""
    probe = D(2020, 1, 15)
    age = simulist.get_feature("age", START, END)
    valid = age.where(
        (F.col("valid_from") <= F.lit(probe))
        & ((F.col("valid_until") > F.lit(probe)) | F.col("valid_until").isNull())
    )
    ll = simulist_linelist(spark).select(
        "id", "birth", F.col("date_death").alias("death")
    )
    from diseasystore_spark.functions.age import age_on_date

    expected = ll.where(
        F.col("death").isNull() | (F.date_add("death", 1) > F.lit(probe))
    ).select("id", age_on_date("birth", probe).alias("expected_age"))
    joined = valid.join(expected, valid["key_pnr"] == expected["id"])
    mismatches = joined.where(F.col("age") != F.col("expected_age")).count()
    assert mismatches == 0


def test_simulist_memoization(simulist):
    table = f"{simulist.target_schema}.simulist_positive"
    simulist.get_feature("n_positive", START, END)
    assert (
        simulist.determine_missing_ranges(table, START, END, simulist.slice_ts)
        == []
    )


def test_simulist_key_join_matrix(simulist):
    """Every observable x stratification combination runs and spans the
    study period (``R/test_diseasystore.R:520-573``)."""
    window = (D(2020, 1, 5), D(2020, 1, 20))
    for observable in simulist.available_observables:
        for strat in [None, ["sex"], ["age"]]:
            out = simulist.key_join_features(observable, strat, *window)
            dates = out.agg(
                F.min("date").alias("mn"), F.max("date").alias("mx")
            ).first()
            assert dates["mn"] == window[0], (observable, strat)
            assert dates["mx"] == window[1], (observable, strat)


def test_simulist_expression_stratification(simulist):
    from diseasystore_spark.functions.age import cut_expr

    out = simulist.key_join_features(
        "n_positive",
        {"age_group": cut_expr(F.col("age"), [15, 30])},
        D(2020, 1, 5),
        D(2020, 1, 20),
    ).collect()
    groups = {r["age_group"] for r in out}
    assert groups <= {"00-14", "15-29", "30+"}
    assert len(groups) >= 2


def test_simulist_constant_stratification(simulist):
    """Feature-independent stratifications (X4 constants,
    ``R/test_diseasystore.R:583-611``)."""
    out = simulist.key_join_features(
        "n_positive",
        {"string": "'test'", "number": "2"},
        D(2020, 1, 5),
        D(2020, 1, 10),
    ).collect()
    assert all(r["string"] == "test" and r["number"] == 2 for r in out)


def test_simulist_backward_extension_preserves_rows(spark, tmp_path):
    """Backfilling an earlier gap must not close still-valid rows from
    the previously computed later range (robustness beyond the
    reference's forward-only extension test)."""
    ds = SimulistDiseasystore(
        spark,
        target_conn=str(tmp_path / "bw"),
        source_conn="synthetic",
        slice_ts=D(2024, 1, 1),
        verbose=False,
    )
    late = (D(2020, 1, 10), D(2020, 1, 20))
    full = (D(2019, 12, 15), D(2020, 1, 20))
    ds.get_feature("n_hospital", *late)
    extended = ds.get_feature("n_hospital", *full)
    from diseasystore_spark.stores.simulist import _compute_hospital

    expected = _compute_hospital(*full, ds.slice_ts, "synthetic", ds)
    got = {tuple(r) for r in extended.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want


# ------------------------------------------------------------------ google

@pytest.fixture(scope="module")
def google(spark, tmp_path_factory):
    src = write_google_fixtures(
        str(tmp_path_factory.mktemp("google_src")), gzip_by_age=True
    )
    root = str(tmp_path_factory.mktemp("google_store"))
    return GoogleCovid19Diseasystore(
        spark,
        target_conn=root,
        source_conn=src,
        slice_ts=D(2024, 1, 1),
        verbose=False,
    )


G_START, G_END = D(2020, 3, 1), D(2020, 3, 14)


def test_google_metric_unpivot(google):
    df = google.get_feature("n_positive", G_START, G_END)
    validate_feature_frame(df)
    assert set(df.columns) == {
        "key_location",
        "key_age_bin",
        "n_positive",
        "valid_from",
        "valid_until",
    }
    # 5 locations x 14 days x 4 bin slots — like the reference's
    # pivot_longer, slots with no bin remain as NULL-valued rows.
    assert df.count() == 14 * 5 * 4
    non_null = df.where(F.col("n_positive").isNotNull()).count()
    assert non_null == 14 * (4 + 4 + 4 + 3 + 3)


def test_google_age_group_labels(google):
    df = google.get_feature("age_group", G_START, G_END)
    labels = {
        (r["key_location"], r["key_age_bin"]): r["age_group"]
        for r in df.collect()
    }
    assert labels[("US", "0")] == "00-19"
    assert labels[("US", "3")] == "60+"
    assert labels[("DK", "0")] == "00-29"
    assert labels[("DK", "2")] == "60+"


def test_google_population_labels(google):
    df = google.get_feature("n_population", G_START, G_END)
    groups = {r["age_group"] for r in df.collect()}
    assert groups == {"00-09", "10-19", "20-29", "80+"}


def test_google_key_join_filter_country_level(google):
    """Unstratified: only coarsest-per-country rows are counted, so
    prevalence equals the country-level sum only (P6)."""
    out = google.key_join_features(
        "n_positive", None, G_START, G_END
    ).collect()
    by_date = {r["date"]: r["n_positive"] for r in out}
    # country rows: US (li=0) and DK (li=3): values per (li, di, mi=2):
    # sum over bins of (li+1)(di+1)+4+ai
    def country_sum(li, di, nbins):
        return sum((li + 1) * (di + 1) + 4 + ai for ai in range(nbins))

    for di in range(14):
        expected = country_sum(0, di, 4) + country_sum(3, di, 3)
        assert by_date[D(2020, 3, di + 1)] == expected, di


def test_google_stratified_by_region(google):
    out = google.key_join_features(
        "n_positive", ["region"], G_START, G_END
    ).collect()
    regions = {r["region"] for r in out}
    assert regions == {"California", "Hovedstaden"}


def test_google_temperature_observables(google):
    assert "min_temperature" in google.available_observables
    assert "max_temperature" in google.available_observables
    out = google.key_join_features(
        "min_temperature", None, G_START, G_END
    ).collect()
    assert len(out) == 14


# -------------------------------------------------------------------- ecdc

@pytest.fixture(scope="module")
def ecdc(spark, tmp_path_factory):
    src = write_ecdc_snapshots(
        str(tmp_path_factory.mktemp("ecdc_src")),
        ["2023-10-20", "2023-10-27", "2023-11-03"],
    )
    root = str(tmp_path_factory.mktemp("ecdc_store"))
    return EcdcRespiratoryVirusesDiseasystore(
        spark,
        target_conn=root,
        source_conn=src,
        verbose=False,
    )


E_START, E_END = D(2023, 10, 2), D(2023, 10, 29)


def test_ecdc_snapshot_asof_selection(ecdc):
    """slice_ts picks the closest earlier snapshot file (S3): the
    2023-10-21 slice resolves the 10-20 snapshot (2 weeks of data);
    2023-11-04 resolves 11-03 (4 weeks)."""
    early = ecdc.get_feature(
        "iliari_rates", E_START, E_END, slice_ts="2023-10-21"
    )
    late = ecdc.get_feature(
        "iliari_rates", E_START, E_END, slice_ts="2023-11-04"
    )
    early_weeks = {r["valid_from"] for r in early.select("valid_from").collect()}
    late_weeks = {r["valid_from"] for r in late.select("valid_from").collect()}
    assert len(early_weeks) == 2
    assert len(late_weeks) == 4
    assert early_weeks < late_weeks


def test_ecdc_iso_week_validity(ecdc):
    df = ecdc.get_feature("iliari_rates", E_START, E_END, slice_ts="2023-11-04")
    row = df.where(F.col("valid_from") == D(2023, 10, 2)).first()
    assert row is not None  # 2023-W40 starts Monday 2023-10-02
    assert row["valid_until"] == D(2023, 10, 9)


def test_ecdc_age_group_normalization(ecdc):
    df = ecdc.get_feature("iliari_rates", E_START, E_END, slice_ts="2023-11-04")
    groups = {r["age_group"] for r in df.select("age_group").distinct().collect()}
    assert groups == {"00-04", "05-14", "15-64", "65+", None}


def test_ecdc_no_observables(ecdc):
    """None of the ECDC features are observables (identity aggregator
    store) — key_join_features is unreachable, as in the reference."""
    assert ecdc.available_observables == []
    assert set(ecdc.available_stratifications) == {
        "iliari_rates",
        "infection_type",
        "age_group",
    }
