"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (engine-backed stratified
prevalence) on sf0.001; ``queries()`` / ``oracle_sql()`` expose the
operator registry from ``diseasystore_spark.queries``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _ensure_nanos_flag(spark: SparkSession) -> None:
    # Runtime confs the registry depends on, set defensively in case
    # the hosting session was built without them: events.ts has
    # shipped both as TIMESTAMP(NANOS) (read as nanosecond longs under
    # nanosAsLong; `_read` adapts to either encoding) and as
    # TIMESTAMP(MICROS), and timestamp outputs are compared against
    # TZ-naive DuckDB, so the session timezone must be UTC.
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full engine pipeline —
    SCD2 store + memoization + interlace + delta-count prevalence,
    stratified by nation."""
    _ensure_nanos_flag(spark)
    from diseasystore_spark.queries import q02_prevalence_by_nation

    return q02_prevalence_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from diseasystore_spark.queries import QUERIES

    def wrap(fn):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_nanos_flag(spark)
            return fn(spark, sf_dir)

        return inner

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from diseasystore_spark.queries import ORACLES

    return dict(ORACLES)
