"""Run the exported conformance suite (the reference's
``test_diseasystore`` analog) against the bundled stores."""

from __future__ import annotations

import datetime

from diseasystore_spark.testing import run_conformance_suite
from diseasystore_spark.stores.simulist import SimulistDiseasystore
from diseasystore_spark.stores.google_covid19 import GoogleCovid19Diseasystore
from tests.store_fixtures import write_google_fixtures

D = datetime.date


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


def test_google_conformance(spark, tmp_path):
    src = write_google_fixtures(str(tmp_path / "src"), gzip_by_age=False)
    ds = GoogleCovid19Diseasystore(
        spark,
        target_conn=str(tmp_path / "store"),
        source_conn=src,
        slice_ts=D(2024, 1, 1),
        verbose=False,
    )
    # key_join paths for Google are covered in test_stores (the full
    # matrix here would run ~60 prevalence queries).
    ran = run_conformance_suite(
        ds, test_start_date=D(2020, 3, 2), skip_key_join=True
    )
    assert "extension-equality" in ran
