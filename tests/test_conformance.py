"""Run the exported conformance suite (the reference's
``test_diseasystore`` analog, ``R/test_diseasystore.R:42-678``)
against ALL FOUR bundled stores — the exhaustive observable x
stratification matrix, graceful-failure message parity, the
feature-independent stratification check, and the date-span
postconditions, per store."""

from __future__ import annotations

import datetime

from diseasystore_spark.testing import run_conformance_suite
from diseasystore_spark.stores.ecdc import EcdcRespiratoryVirusesDiseasystore
from diseasystore_spark.stores.google_covid19 import GoogleCovid19Diseasystore
from diseasystore_spark.stores.simulist import SimulistDiseasystore
from diseasystore_spark.stores.tpch import TpchDiseasystore
from tests.store_fixtures import write_ecdc_snapshots, write_google_fixtures

D = datetime.date

SF_DIR = "/root/testdata/sf0.001"


def test_tpch_conformance(spark, tmp_path):
    ds = TpchDiseasystore(
        spark,
        target_conn=str(tmp_path / "store"),
        source_conn=SF_DIR,
        slice_ts=D(2024, 1, 1),
        verbose=False,
    )
    ran = run_conformance_suite(ds, test_start_date=D(1996, 1, 5))
    assert "key-join-matrix" in ran
    assert "feature-independent-stratification" in ran
    assert "graceful-failure-messages" in ran


def test_simulist_conformance(spark, tmp_path):
    ds = SimulistDiseasystore(
        spark,
        target_conn=str(tmp_path / "store"),
        source_conn="synthetic",
        slice_ts=D(2024, 1, 1),
        verbose=False,
    )
    ran = run_conformance_suite(ds, test_start_date=D(2020, 1, 5))
    assert "key-join-matrix" in ran
    assert "graceful-failure-messages" in ran


def test_google_conformance(spark, tmp_path):
    src = write_google_fixtures(str(tmp_path / "src"), gzip_by_age=False)
    ds = GoogleCovid19Diseasystore(
        spark,
        target_conn=str(tmp_path / "store"),
        source_conn=src,
        slice_ts=D(2024, 1, 1),
        verbose=False,
    )
    ran = run_conformance_suite(ds, test_start_date=D(2020, 3, 2))
    assert "key-join-matrix" in ran
    assert "graceful-failure-messages" in ran


def test_ecdc_conformance(spark, tmp_path):
    """ECDC is the identity-aggregator store: no observables, so the
    key_join sections are vacuous (as in the reference) — the suite
    still exercises golden equality, contract checks, memoization and
    extension for its snapshot features."""
    src = write_ecdc_snapshots(
        str(tmp_path / "src"), ["2023-10-20", "2023-10-27", "2023-11-03"]
    )
    ds = EcdcRespiratoryVirusesDiseasystore(
        spark,
        target_conn=str(tmp_path / "store"),
        source_conn=src,
        slice_ts="2023-11-04",
        verbose=False,
    )
    assert ds.available_observables == []
    ran = run_conformance_suite(ds, test_start_date=D(2023, 10, 2))
    assert "extension-equality" in ran


def test_google_conformance_scaled_fixture(spark, tmp_path):
    """The reference runs its suite against the real (large) Google
    CSVs (``R/test_diseasystore.R:545-573``); the sandbox has no
    network, so this is the scaled stand-in: 4x locations (25, incl.
    20 synthetic level-2 subregions) x 4x dates (56 days), gzipped
    by-age file — same store logic, bigger key space and CSV volume,
    full observable x stratification matrix."""
    src = write_google_fixtures(
        str(tmp_path / "src"), gzip_by_age=True, scale=4
    )
    ds = GoogleCovid19Diseasystore(
        spark,
        target_conn=str(tmp_path / "store"),
        source_conn=src,
        slice_ts=D(2024, 1, 1),
        verbose=False,
    )
    ran = run_conformance_suite(ds, test_start_date=D(2020, 3, 2))
    assert "key-join-matrix" in ran
    assert "graceful-failure-messages" in ran


def test_ecdc_conformance_scaled_fixture(spark, tmp_path):
    """ECDC at 3x scale: 9 countries x 12 weeks x 4 snapshots — the
    fuzzy as-of snapshot selection and identity-aggregator extension
    checks over a fixture an order of magnitude larger."""
    src = write_ecdc_snapshots(
        str(tmp_path / "src"),
        ["2023-10-20", "2023-10-27", "2023-11-03", "2023-11-10"],
        scale=3,
    )
    ds = EcdcRespiratoryVirusesDiseasystore(
        spark,
        target_conn=str(tmp_path / "store"),
        source_conn=src,
        slice_ts="2023-11-11",
        verbose=False,
    )
    ran = run_conformance_suite(ds, test_start_date=D(2023, 10, 2))
    assert "extension-equality" in ran
