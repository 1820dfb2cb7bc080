"""Store discovery + case helpers (F6, R/3_feature_store_helpers.R)."""

from __future__ import annotations

import pytest

from diseasystore_spark.registry import (
    available_diseasystores,
    diseasystore_exists,
    get_diseasystore,
    register_store,
    to_diseasystore_case,
)


def test_to_diseasystore_case_goldens():
    # golden from the reference docs (R/3_feature_store_helpers.R:10)
    assert to_diseasystore_case("Google COVID-19") == "DiseasystoreGoogleCovid19"
    assert to_diseasystore_case("simulist") == "DiseasystoreSimulist"
    assert to_diseasystore_case("ecdc_respiratory viruses") == (
        "DiseasystoreEcdcRespiratoryViruses"
    )
    assert to_diseasystore_case("camelCase") == "DiseasystoreCamelCase"


def test_exists_and_get():
    assert diseasystore_exists("Google COVID-19")
    assert diseasystore_exists("simulist")
    assert not diseasystore_exists("Nope Not Here")
    cls = get_diseasystore("Google COVID-19")
    assert cls.__name__ == "GoogleCovid19Diseasystore"
    with pytest.raises(KeyError, match="available"):
        get_diseasystore("Nope Not Here")


def test_register_store():
    from diseasystore_spark import Diseasystore

    @register_store
    class DiseasystoreMyCustom(Diseasystore):
        pass

    assert diseasystore_exists("my custom")
    assert get_diseasystore("my custom") is DiseasystoreMyCustom
    assert "DiseasystoreMyCustom" in available_diseasystores()
