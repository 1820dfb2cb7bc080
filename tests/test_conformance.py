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


def test_google_scaled_fixture_engine_plans(spark, tmp_path):
    """VERDICT r8 item 5 — plan assertions on the scaled Google
    fixture, so the reference vignette path
    (``vignettes/extending-diseasystore-example.Rmd:534-576``) is
    covered at more than toy size AND with the plans a 100-TB run
    needs: the compute's date window reaches the CSV scan as pushed
    filters, the small spatial filter-level frame is broadcast into
    the de-double-counting semi join, and the age-group map side of
    an age-stratified key join goes through a broadcast hash join
    (never a shuffled SMJ against the metric)."""
    import re

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
    start, end = D(2020, 3, 2), D(2020, 4, 20)

    # 1. CSV pushdown: the metric compute's date filter must appear in
    #    the csv FileScan's PushedFilters (column pruning is visible as
    #    the ReadSchema subset). The scan's metadata string truncates
    #    at spark.sql.maxMetadataStringLength (default 100 — cuts the
    #    PushedFilters list mid-entry), so widen it for the assertion.
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    try:
        frame = ds.google_covid_19_positive.compute(
            start, end, D(2024, 1, 1), src, ds
        )
        plan = frame._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    assert "FileScan csv" in plan, plan
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("date" in p for p in pushed), (
        f"date window not pushed to the CSV scan: {pushed}"
    )

    # 2. no spatial stratification -> key_join_filter's min-level
    #    frame is broadcast into a left-semi join
    kj_plain = ds.key_join_features("n_positive", None, start, end)
    p2 = kj_plain._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p2 and "LeftSemi" in p2, p2

    # 3. age-stratified key join: the age-group map is the small side
    #    of a broadcast hash join (both it and the spine frames are
    #    dwarfed by the metric at production scale)
    kj_age = ds.key_join_features("n_positive", ["age_group"], start, end)
    p3 = kj_age._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p3, p3
    # and the result is real at this scale
    assert kj_age.count() > 0
