from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diseasystore_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("diseasystore-tests", cpus=8)
    yield spark


@pytest.fixture()
def store_root(tmp_path):
    return str(tmp_path / "feature_store")
