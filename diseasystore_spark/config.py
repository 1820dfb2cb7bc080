"""Scoped configuration — analog of the reference's ``diseasyoption``.

Reference: ``R/0_R6_utils.R:78-160`` — option lookup resolves
``diseasystore.<Class>.<opt>`` before falling back to
``diseasystore.<opt>``; the empty string is treated as unset.
Defaults per ``R/DiseasystoreBase.R:794-802``.
"""

from __future__ import annotations

from typing import Any

_OPTIONS: dict[str, Any] = {
    "diseasystore.target_schema": "ds",
    "diseasystore.verbose": True,
    "diseasystore.lock_wait_max": 30 * 60,  # seconds
    "diseasystore.lock_wait_increment": 15,  # seconds
}


def _class_names(scope: Any) -> list[str]:
    """Resolve a scope (instance, class, or str) to class-name candidates,
    most specific first (walks the MRO like the reference walks R6
    inheritance)."""
    if scope is None:
        return []
    if isinstance(scope, str):
        return [scope]
    cls = scope if isinstance(scope, type) else type(scope)
    names = []
    for klass in cls.__mro__:
        if klass.__name__ in ("object",):
            continue
        names.append(klass.__name__)
    return names


def diseasyoption(option: str, scope: Any = None, default: Any = None) -> Any:
    """Layered option lookup: class-specific -> global -> default.

    ``""`` (empty string) is treated as unset, matching the reference
    (``R/0_R6_utils.R:141-148``).
    """
    for name in _class_names(scope):
        key = f"diseasystore.{name}.{option}"
        if key in _OPTIONS and _OPTIONS[key] != "":
            return _OPTIONS[key]
    key = f"diseasystore.{option}"
    if key in _OPTIONS and _OPTIONS[key] != "":
        return _OPTIONS[key]
    return default


def set_diseasyoption(option: str, value: Any, scope: Any = None) -> None:
    """Set a global or class-scoped option."""
    names = _class_names(scope)
    if names:
        _OPTIONS[f"diseasystore.{names[0]}.{option}"] = value
    else:
        _OPTIONS[f"diseasystore.{option}"] = value
