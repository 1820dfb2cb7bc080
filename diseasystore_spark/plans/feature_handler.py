"""FeatureHandler — the per-feature extensibility triple.

Parity target ``R/2_FeatureHandler.R:48-134``: a handler bundles

- ``compute(start_date, end_date, slice_ts, source_conn, ds) ->
  DataFrame`` — produce the feature frame for a date range (may
  recursively request other features via the ``ds`` back-reference,
  e.g. ``R/DiseasystoreSimulist.R:84,128,192``);
- ``get(target_table, slice_ts, store) -> DataFrame`` — read back the
  stored snapshot (default: SCD2 snapshot read, the analog of
  ``SCDB::get_table``);
- ``key_join(grouped, feature) -> DataFrame`` — the aggregator used
  when this feature is the observable of a stratified query.

These are plan-level Python callables over DataFrames, not Spark UDFs:
they run on the driver and *build* distributed plans.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from diseasystore_spark.operators.aggregators import Aggregator


def _compute_not_configured(*args: Any, **kwargs: Any) -> DataFrame:
    raise NotImplementedError("compute not configured!")


def _key_join_not_configured(*args: Any, **kwargs: Any) -> DataFrame:
    raise NotImplementedError("key_join not configured!")


@dataclass
class FeatureHandler:
    compute: Callable[..., DataFrame] = field(default=_compute_not_configured)
    get: Callable[..., DataFrame] | None = None
    key_join: Aggregator = field(default=_key_join_not_configured)

    def read(
        self,
        store: Any,
        target_table: str,
        slice_ts: Any,
        max_valid_from: Any = None,
        min_valid_until: Any = None,
    ) -> DataFrame:
        """Dispatch the snapshot read: custom ``get`` if provided, else
        the SCD2 default (``R/2_FeatureHandler.R:90-96``).
        ``max_valid_from`` / ``min_valid_until`` let the default read
        prune month partitions outside the study period (the caller
        must apply the overlap clip — ``get_feature`` does)."""
        if self.get is not None:
            return self.get(
                target_table=target_table, slice_ts=slice_ts, store=store
            )
        return store.backend.get_table(
            target_table,
            slice_ts,
            max_valid_from=max_valid_from,
            min_valid_until=min_valid_until,
        )
