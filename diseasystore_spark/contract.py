"""The feature-frame data contract.

Every feature is a relation with (reference:
``R/2_FeatureHandler.R:55-63``, ``vignettes/extending-diseasystore.Rmd:31-44``):

- one or more ``key_*`` columns — join keys,
- one or more payload columns — the feature values,
- ``valid_from`` / ``valid_until`` DATE columns encoding the
  half-open validity interval ``valid_from <= t < valid_until``
  with ``valid_until IS NULL`` meaning "valid forever".

Invariants (enforced here; the reference checks them only in its
conformance suite, ``R/test_diseasystore.R:335-371``):

- ``valid_from`` is never NULL,
- ``valid_from < valid_until`` strictly,
- both validity columns are DATE-typed.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

VALIDITY_COLUMNS = ("valid_from", "valid_until")
SCD2_COLUMNS = ("checksum", "from_ts", "until_ts")


def key_columns(df: DataFrame | list[str]) -> list[str]:
    """Columns named ``key_*`` (semantics are column-name driven,
    reference ``R/truncate_interlace.R:91``)."""
    cols = df.columns if isinstance(df, DataFrame) else df
    return [c for c in cols if c.startswith("key_")]


def payload_columns(df: DataFrame | list[str]) -> list[str]:
    """Feature payload columns: everything that is not a key, validity,
    or SCD2 bookkeeping column."""
    cols = df.columns if isinstance(df, DataFrame) else df
    reserved = set(VALIDITY_COLUMNS) | set(SCD2_COLUMNS)
    return [c for c in cols if not c.startswith("key_") and c not in reserved]


class FeatureContractError(ValueError):
    pass


def validate_feature_frame(
    df: DataFrame,
    start_date: datetime.date | None = None,
    end_date: datetime.date | None = None,
    check_rows: bool = False,
) -> DataFrame:
    """Validate the feature-frame contract; returns ``df`` for chaining.

    Schema checks are always performed (cheap, driver-side). Row-level
    invariant checks (``check_rows=True``) trigger a Spark job and are
    meant for tests / debugging, mirroring ``R/test_diseasystore.R:335-371``.
    """
    cols = df.columns
    if not key_columns(cols):
        raise FeatureContractError(
            f"feature frame must have at least one 'key_*' column, got {cols}"
        )
    for c in VALIDITY_COLUMNS:
        if c not in cols:
            raise FeatureContractError(f"feature frame missing column '{c}'")
    # Zero payload columns is legal: count-style features (e.g. the
    # reference's n_positive, R/DiseasystoreSimulist.R:148-164) carry
    # only keys + validity; the "value" is row existence.
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in VALIDITY_COLUMNS:
        if not isinstance(schema[c], T.DateType):
            raise FeatureContractError(
                f"column '{c}' must be DATE, got {schema[c].simpleString()}"
            )

    if check_rows:
        checks = df.select(
            F.sum(F.col("valid_from").isNull().cast("int")).alias("null_from"),
            F.sum(
                (F.col("valid_until").isNotNull() & (F.col("valid_from") >= F.col("valid_until")))
                .cast("int")
            ).alias("bad_order"),
            (
                F.sum(
                    (
                        (F.col("valid_until") <= F.lit(start_date))
                        | (F.col("valid_from") > F.lit(end_date))
                    ).cast("int")
                ).alias("outside")
                if start_date is not None and end_date is not None
                else F.lit(0).alias("outside")
            ),
        ).first()
        if checks["null_from"]:
            raise FeatureContractError("valid_from must not be NULL")
        if checks["bad_order"]:
            raise FeatureContractError("valid_from must be strictly before valid_until")
        if checks["outside"]:
            raise FeatureContractError(
                "feature rows outside the requested study period "
                f"[{start_date}, {end_date}]"
            )
    return df
