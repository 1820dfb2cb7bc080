"""Skew mitigation: deterministic key salting for hot-key joins.

AQE's skew-join splitting (enabled in the session factory) is the
first line of defense; explicit salting is the fallback when a single
key dwarfs every split target (e.g. a country-level location key in
the Google store joined against per-person rows, or a stop-phrase
shingle in dedup).

The construction: the large side scatters each row into one of
``salt`` sub-keys via a deterministic hash of a discriminator column
(no RNG — reproducible plans); the smaller-but-unbroadcastable side
replicates each row ``salt`` times via ``explode(sequence(...))``.
The join key becomes (key, salt), so the hot key's rows spread over
``salt`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
    discriminator: str | None = None,
) -> DataFrame:
    """Join ``large`` (skewed side) with ``small`` (replicated side)
    on ``on`` with ``salt``-way key salting.

    ``discriminator``: a column of ``large`` whose hash scatters rows
    of the same join key across salts; defaults to all non-key columns
    (rows identical in every column land on the same salt — harmless,
    they are duplicates anyway).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if discriminator is None:
        disc_cols = [c for c in large.columns if c not in keys]
    else:
        disc_cols = [discriminator]
    if not disc_cols:
        disc_cols = keys

    left = large.withColumn(
        "__salt", F.pmod(F.xxhash64(*disc_cols), F.lit(salt)).cast("int")
    )
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = left.join(right, [*keys, "__salt"], how)
    return joined.drop("__salt")
