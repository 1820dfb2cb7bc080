"""Delta counting + date-spine cumulative prevalence.

The reference's stratified-aggregation tail
(``R/DiseasystoreBase.R:455-499``): interval-valid feature rows are
converted to per-day deltas (grouped on ``date = valid_from`` for
additions and ``date = valid_until`` for removals, each through the
feature's aggregator), densified over a daily spine x distinct strata,
and turned into point-in-time prevalence with a cumulative-sum window.

Spark-first notes:

- The spine is ``sequence``/``explode`` (JVM-side), crossJoined with
  the distinct strata — the spine side is tiny and broadcast.
- The two delta aggregations are separate ``groupBy``s to preserve the
  pluggable-aggregator surface (``FeatureHandler.key_join`` may be any
  callable); both benefit from map-side partial aggregation. For the
  built-in sum/count aggregators a fused single-pass
  ``explode(array(+1,-1))`` variant would halve the shuffle — a
  candidate optimization once profiling justifies specializing.
- Null-safe joins (``na_matches = "na"`` at
  ``R/DiseasystoreBase.R:491-492``) use ``eqNullSafe`` so NULL strata
  values group correctly.
- The cumsum window partitions by strata and orders by date. When
  strata cardinality is low, all data lands in few window partitions;
  the rows per (strata) after densification = days-in-window, bounded
  and small, so this is safe at scale (the heavy data was already
  reduced by the delta aggregation).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diseasystore_spark.functions.dates import date_spine
from diseasystore_spark.operators.aggregators import Aggregator


def delta_count_prevalence(
    df: DataFrame,
    strata: dict[str, Column] | None,
    observable: str,
    aggregator: Aggregator,
    spark: SparkSession,
    start_date: datetime.date,
    end_date: datetime.date,
) -> DataFrame:
    """Compute per-day prevalence of ``observable`` per stratum.

    ``strata`` maps output column names to grouping expressions
    (already-resolved Columns); None/empty means no stratification.
    Returns columns ``(date, *strata, <observable>)``.
    """
    strata = strata or {}
    strata_names = list(strata.keys())

    # Evaluate stratification expressions once, up front, so grouping,
    # distinct-strata enumeration, and joins all see plain columns.
    work = df.withColumns(strata)

    t_add = aggregator(
        work.groupBy(*strata_names, F.col("valid_from").alias("date")), observable
    ).withColumnRenamed("n", "n_add")
    t_remove = aggregator(
        work.groupBy(*strata_names, F.col("valid_until").alias("date")), observable
    ).withColumnRenamed("n", "n_remove")

    spine = date_spine(spark, start_date, end_date)
    if strata_names:
        combos = work.select(*strata_names).distinct().crossJoin(F.broadcast(spine))
    else:
        combos = spine

    def nullsafe_cond(left: DataFrame, right: DataFrame) -> Column:
        cond = left["date"] == right["date"]
        for s in strata_names:
            cond = cond & left[s].eqNullSafe(right[s])
        return cond

    joined = combos.join(
        t_add, nullsafe_cond(combos, t_add), "left"
    ).select(combos["*"], t_add["n_add"])
    joined = joined.join(
        t_remove, nullsafe_cond(joined, t_remove), "left"
    ).select(joined["*"], t_remove["n_remove"])
    joined = joined.fillna({"n_add": 0, "n_remove": 0})

    w = (
        Window.partitionBy(*strata_names)
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "date",
        *strata_names,
        (F.sum("n_add").over(w) - F.sum("n_remove").over(w)).alias(observable),
    )
