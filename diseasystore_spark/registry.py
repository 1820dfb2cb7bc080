"""Store discovery helpers (F6 + registry lookups).

Parity target ``R/3_feature_store_helpers.R``:

- ``to_diseasystore_case`` (:7-19): label -> PascalCase class name,
  e.g. ``"Google COVID-19" -> "DiseasystoreGoogleCovid19"``.
- ``available_diseasystores`` / ``diseasystore_exists`` /
  ``get_diseasystore`` (:22-76): the reference scans the R search
  path; here the registry is the ``diseasystore_spark.stores`` package
  (plus any classes registered at runtime via ``register_store``).
"""

from __future__ import annotations

import re

from diseasystore_spark.plans.store import Diseasystore

# Runtime-registered stores (augments the bundled ones).
_EXTRA_STORES: dict[str, type[Diseasystore]] = {}

# Our class names drop the reference's "Diseasystore" prefix in favor
# of a suffix; both spellings resolve.
_ALIASES = {
    "DiseasystoreGoogleCovid19": "GoogleCovid19Diseasystore",
    "DiseasystoreSimulist": "SimulistDiseasystore",
    "DiseasystoreEcdcRespiratoryViruses": "EcdcRespiratoryVirusesDiseasystore",
    "DiseasystoreTpch": "TpchDiseasystore",
}


def to_diseasystore_case(label: str) -> str:
    """``"Google COVID-19" -> "DiseasystoreGoogleCovid19"``
    (``R/3_feature_store_helpers.R:7-19``): underscores to spaces,
    split camelCase, title-case each word, strip spaces and dashes,
    prefix ``Diseasystore``."""
    s = label.replace("_", " ")
    s = re.sub(r"(?<=[a-z])([A-Z])", r" \1", s)
    s = s.title()
    s = s.replace(" ", "").replace("-", "")
    return f"Diseasystore{s}"


def register_store(cls: type[Diseasystore]) -> type[Diseasystore]:
    """Class decorator / function to add a store to the registry."""
    _EXTRA_STORES[cls.__name__] = cls
    return cls


def available_diseasystores() -> dict[str, type[Diseasystore]]:
    from diseasystore_spark import stores as bundled
    from diseasystore_spark.stores.ecdc import (
        EcdcRespiratoryVirusesDiseasystore,
    )
    from diseasystore_spark.stores.google_covid19 import (
        GoogleCovid19Diseasystore,
    )
    from diseasystore_spark.stores.simulist import SimulistDiseasystore

    out: dict[str, type[Diseasystore]] = {
        "GoogleCovid19Diseasystore": GoogleCovid19Diseasystore,
        "SimulistDiseasystore": SimulistDiseasystore,
        "EcdcRespiratoryVirusesDiseasystore": EcdcRespiratoryVirusesDiseasystore,
        "TpchDiseasystore": bundled.TpchDiseasystore,
    }
    out.update(_EXTRA_STORES)
    return out


def diseasystore_exists(label: str) -> bool:
    name = to_diseasystore_case(label)
    stores = available_diseasystores()
    return name in stores or _ALIASES.get(name) in stores


def get_diseasystore(label: str) -> type[Diseasystore]:
    name = to_diseasystore_case(label)
    stores = available_diseasystores()
    resolved = name if name in stores else _ALIASES.get(name)
    if resolved is None or resolved not in stores:
        raise KeyError(
            f"no diseasystore for label {label!r} (resolved {name}); "
            f"available: {sorted(stores)}"
        )
    return stores[resolved]
